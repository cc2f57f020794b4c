package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GlobalSort, InvertedIndex, WordCount}

/** Golden end-to-end tests of the three reference kernels on the
  * reference's own fixtures (ported in /root/repo/FIXTURES.md from
  * `trace-wordcount-job/wordcount_sample.txt`, `trace-sort-job/input.txt`,
  * `trace-insertindex-job/insertindex-input-parts/`). */
class GoldenKernelSpec extends AnyFunSuite with SparkSpec {

  private def lines(ls: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    ls.toDF("value")
  }

  val wordcountFixture: Seq[String] = Seq(
    "The quick brown fox jumps over the lazy dog.",
    "The quick brown fox is fast and clever.",
    "Lazy dogs don't jump over quick foxes.",
    "The fox and the dog became friends in the forest.",
    "Every morning, the quick fox would race with the lazy dog.",
    "Sometimes the dog won, but usually the fox was faster.",
    "One day, a clever crow watched them from a tall tree.",
    "She wondered who would win the next morning’s race.",
    "In the end, they both sat under the sun, tired but happy.")

  /** Independent reference model: plain-Scala reimplementation of the
    * kernel semantics (split on \s+, lowercase, strip [^a-z], drop
    * empties, count). */
  private def modelWordCount(ls: Seq[String]): Map[String, Long] =
    ls.flatMap(_.split("\\s+"))
      .map(_.toLowerCase.replaceAll("[^a-z]", ""))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("WordCount matches the reference fixture (golden spot checks + full model)") {
    val got = WordCount(lines(wordcountFixture)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    // Output contract: ascending by word.
    assert(got.map(_._1) == got.map(_._1).sorted)
    val gotMap = got.toMap
    // Hand-checked golden values.
    assert(gotMap("the") == 13L) // 10 lowercase + 3 sentence-initial "The"
    assert(gotMap("fox") == 5L)
    assert(gotMap("dog") == 4L)
    assert(gotMap("dont") == 1L)      // don't → dont
    assert(gotMap("mornings") == 1L)  // morning’s (U+2019) → mornings
    assert(gotMap("quick") == 4L)
    assert(!gotMap.contains(""))
    assert(gotMap == modelWordCount(wordcountFixture))
  }

  val sortFixture: Seq[String] = Seq(
    "orange", "apple", "banana", "grape", "kiwi",
    "pear", "mango", "pineapple", "lemon", "strawberry")

  test("GlobalSort yields the fixture in total lexicographic order") {
    val got = GlobalSort(lines(sortFixture), "value").collect().map(_.getString(0)).toSeq
    assert(got == sortFixture.sorted)
  }

  test("GlobalSort preserves duplicates (sort reducer re-emits each value)") {
    val in = sortFixture ++ Seq("apple", "apple", "kiwi")
    val got = GlobalSort(lines(in), "value").collect().map(_.getString(0)).toSeq
    assert(got == in.sorted)
  }

  val indexFixture: Seq[String] =
    (1 to 5).flatMap(i => Seq(s"apple\tdoc$i", s"banana\tdoc$i", s"cat\tdoc$i")) :+
      "zebra\tdoc6"

  val indexExpected: Seq[(String, String)] = Seq(
    "apple" -> "doc1,doc2,doc3,doc4,doc5",
    "banana" -> "doc1,doc2,doc3,doc4,doc5",
    "cat" -> "doc1,doc2,doc3,doc4,doc5",
    "zebra" -> "doc6")

  test("InvertedIndex matches the reference fixture with sorted postings") {
    val got = InvertedIndex(InvertedIndex.parsePairs(lines(indexFixture)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(got == indexExpected)
  }

  test("InvertedIndex drops blank, tab-less, and whitespace-only lines as malformed") {
    // Reference trims first (Java trim strips tabs), so a lone "\t" is a
    // blank line, not an empty pair.
    val noisy = indexFixture ++ Seq("", "   ", "notab", "\t")
    val got = InvertedIndex(InvertedIndex.parsePairs(lines(noisy)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(got == indexExpected)
  }

  test("InvertedIndex dedups repeated (word, doc) pairs like the reducer HashSet") {
    val dup = indexFixture ++ Seq("apple\tdoc1", "apple\tdoc1")
    val got = InvertedIndex(InvertedIndex.parsePairs(lines(dup)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(got == indexExpected)
  }

  test("saltedPostings is semantically identical to postings") {
    import org.apache.spark.sql.functions.col
    val pairs = InvertedIndex.parsePairs(lines(indexFixture))
    val plain = InvertedIndex.postings(pairs, col("word"), col("doc_id")).collect().toSeq
    val salted = InvertedIndex.saltedPostings(pairs, col("word"), col("doc_id")).collect().toSeq
    assert(plain == salted)
  }

  test("sortedRuns: every output partition is internally sorted, content preserved") {
    val df = GlobalSort.sortedRuns(lines(sortFixture ++ sortFixture), 3, "value")
    val parts = df.rdd.glom().collect().map(_.map(_.getString(0)).toSeq).toSeq
    assert(parts.forall(p => p == p.sorted))
    assert(parts.flatten.sorted == (sortFixture ++ sortFixture).sorted)
  }
}
