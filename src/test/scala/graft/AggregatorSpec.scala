package graft

import org.apache.spark.sql.functions.udaf
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.operators.InvertedIndex
import graft.sources.TextIO

/** Typed-Aggregator surface (§2.10) + S2 split-size control tests. */
class AggregatorSpec extends AnyFunSuite with SparkSpec {

  private val indexFixture: Seq[String] =
    (1 to 5).flatMap(i => Seq(s"apple\tdoc$i", s"banana\tdoc$i", s"cat\tdoc$i")) :+
      "zebra\tdoc6"

  test("PostingList Aggregator reproduces the collect_set posting pipeline") {
    val s = spark
    import s.implicits._
    val pairs = InvertedIndex.parsePairs(indexFixture.toDF("value"))
    // Typed path: groupByKey + the Aggregator as a TypedColumn.
    val typed = pairs.as[(String, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(Aggregators.PostingList.toColumn.name("doc_ids"))
      .toDF("word", "doc_ids")
      .orderBy("word")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    val builtin = InvertedIndex(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(typed == builtin)
  }

  test("PostingList registered as a SQL udaf works in spark.sql") {
    spark.udf.register("posting_list", udaf(Aggregators.PostingList))
    val s = spark
    import s.implicits._
    InvertedIndex.parsePairs(indexFixture.toDF("value"))
      .createOrReplaceTempView("pairs_v")
    val got = spark.sql(
      "SELECT word, posting_list(doc_id) AS doc_ids FROM pairs_v GROUP BY word ORDER BY word")
      .collect().map(r => r.getString(0) -> r.getString(1)).toSeq
    assert(got == Seq(
      "apple" -> "doc1,doc2,doc3,doc4,doc5",
      "banana" -> "doc1,doc2,doc3,doc4,doc5",
      "cat" -> "doc1,doc2,doc3,doc4,doc5",
      "zebra" -> "doc6"))
  }

  test("Summarize Aggregator merges partial summaries correctly") {
    val s = spark
    import s.implicits._
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val got = xs.toDS().repartition(3)
      .select(Aggregators.Summarize.toColumn.name("s"))
      .collect()(0)
    assert(got.n == 5L)
    assert(got.sum == 20.0)
    assert(got.min == 1.0 && got.max == 10.0)
    assert(math.abs(got.mean - 4.0) < 1e-12)
  }

  test("BottomK aggregate selects the same docs as the window formulation") {
    val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("source"),
        graft.functions.TextFunctions.hash60(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("sample:"),
            org.apache.spark.sql.functions.col("doc_id").cast("string"))).as("h"))
    // Aggregate form: k-bounded partial aggregation.
    val viaAgg = docs.as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.BottomK(5).toColumn.name("hs"))
      .collect().map { case (src, hs) => src -> hs.toList }.toMap
    // Window form: full shuffle + per-group sort (the non-scale path).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h")
    val viaWindow = docs
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(w))
      .filter(org.apache.spark.sql.functions.col("rnk") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted.toList }
    assert(viaAgg == viaWindow)
  }

  test("S3: many small files combine into few partitions (native packing)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-smallfiles")
    (1 to 40).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"part-$i.txt"), s"line-$i\n".getBytes)
    }
    val df = TextIO.readLines(spark, dir.toString)
    // 40 tiny files must NOT become 40 partitions — Spark packs them by
    // maxPartitionBytes/openCostInBytes (the reference left this to a
    // commented-out CombineTextInputFormat).
    assert(df.rdd.getNumPartitions < 40)
    assert(df.count() == 40)
  }

  test("q_hll_distinct's tolerance gate is falsifiable: a poisoned estimate trips it") {
    // The oracle side of q_hll_distinct is a TRUE constant, so the
    // gate's ability to FAIL must be proven here: an estimate 50% off
    // a 1000-cardinality exact count must come out false under the
    // same predicate the query uses, while a within-tolerance one
    // passes.
    import org.apache.spark.sql.functions._
    val row = spark.range(1).select(
      graft.queries.CorpusQueries.hllOk(lit(1500L), lit(1000L), 0.02).as("poisoned"),
      graft.queries.CorpusQueries.hllOk(lit(1010L), lit(1000L), 0.02).as("close"))
      .head()
    assert(!row.getBoolean(0), "a 50%-off estimate must trip the gate")
    assert(row.getBoolean(1), "a 1%-off estimate must pass the gate")
  }

  test("S2: explicit split size yields more partitions for the same file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-split")
    val f = dir.resolve("big.txt")
    java.nio.file.Files.write(f, (1 to 20000).map(i => s"line-$i-padding-padding")
      .mkString("\n").getBytes)
    val coarse = TextIO.readLines(spark, f.toString).rdd.getNumPartitions
    val fine = TextIO.readLines(spark, f.toString, 32 * 1024).rdd.getNumPartitions
    assert(fine > coarse)
    assert(TextIO.readLines(spark, f.toString, 32 * 1024).count() == 20000)
  }
}
