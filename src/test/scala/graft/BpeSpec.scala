package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.Merge

/** Pins BpeTrainer's merge semantics against an independent plain-Scala
  * greedy-BPE model (Sennrich et al.'s reference algorithm), with the
  * adversarial cases the delimiter-replace encoding must get right:
  * immediate pair repeats (`abab`), odd/even same-symbol runs
  * (`aaa`/`aaaa`), and multi-char symbols after earlier merges.
  */
class BpeSpec extends AnyFunSuite with SparkSpec {

  /** Reference greedy merge of one pair over a symbol sequence:
    * left-to-right, a merged pair's symbols can't be reused. */
  private def modelMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  /** Reference trainer: frequency-weighted pair counts (every adjacent
    * position counts), argmax by (count desc, lhs asc, rhs asc). */
  private def modelTrain(words: Map[String, Long], k: Int): (List[Merge], Map[List[String], Long]) = {
    var state: Map[List[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toList -> c }
    val merges = scala.collection.mutable.ListBuffer.empty[Merge]
    var rank = 1
    var stop = false
    while (rank <= k && !stop) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => pairs(p) = pairs.getOrElse(p, 0L) + c)
      }
      // The min-frequency floor: a pair seen once never merges
      // (BpeTrainer.MinPairFrequency, the learn_bpe default).
      val eligible = pairs.filter(_._2 >= 2)
      if (eligible.isEmpty) stop = true
      else {
        val ((a, b), c) = eligible.minBy { case ((l, r), n) => (-n, l, r) }
        merges += Merge(rank, a, b, c)
        state = state.groupMapReduce(kv => modelMerge(kv._1, a, b))(_._2)(_ + _)
        rank += 1
      }
    }
    (merges.toList, state)
  }

  private def trainSpark(words: Seq[String], k: Int): (Seq[Merge], Map[String, Long]) = {
    val s = spark
    import s.implicits._
    val df = words.toDF("word")
    val (merges, trained) = BpeTrainer.train(df, k)
    val syms = trained
      .select(col("word"), BpeTrainer.symbolCount(col("rep")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (merges, syms)
  }

  private def check(words: Seq[String], k: Int): Unit = {
    val (got, gotSyms) = trainSpark(words, k)
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (want, wantState) = modelTrain(freq, k)
    assert(got == want, s"merge sequence diverged: got=$got want=$want")
    val wantSyms = wantState.map { case (syms, _) => syms.mkString -> syms.length }
    gotSyms.foreach { case (w, n) =>
      assert(n == wantSyms(w), s"word '$w': symbol count $n != ${wantSyms(w)}")
    }
  }

  test("classic corpus: low/lower/newest/widest learns the expected merges") {
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    check(words, 6)
  }

  test("immediate pair repeat 'abab': both occurrences merge in one round") {
    // With (a,b) the winning pair, greedy BPE turns a-b-a-b into ab-ab.
    // A single-delimiter replace would miss the second occurrence — the
    // double-delimiter encoding must not.
    val (merges, syms) = trainSpark(Seq.fill(4)("abab"), 1)
    assert(merges.head.left == "a" && merges.head.right == "b")
    assert(merges.head.count == 8, "both positions count, x4 words")
    assert(syms("abab") == 2L, "abab must become [ab][ab]")
    check(Seq.fill(4)("abab"), 3)
  }

  test("same-symbol runs: aaaa merges twice, aaa leaves a tail single") {
    val (m4, s4) = trainSpark(Seq.fill(3)("aaaa"), 1)
    assert(m4.head == Merge(1, "a", "a", 9), "3 adjacent positions x3 words")
    assert(s4("aaaa") == 2L, "aaaa -> [aa][aa]")
    val (_, s3) = trainSpark(Seq.fill(3)("aaa"), 1)
    assert(s3("aaa") == 2L, "aaa -> [aa][a]")
    check(Seq.fill(3)("aaaa") ++ Seq.fill(2)("aaa"), 3)
  }

  test("multi-char symbols: later rounds merge products of earlier ones") {
    // 'eses' after (e,s) becomes [es][es]; round 2 must merge the
    // two-char symbols, exercising replace with multi-char operands.
    check(Seq.fill(5)("eses") ++ Seq.fill(2)("es"), 3)
  }

  test("fixture corpus: trainer matches the model end-to-end") {
    val s = spark
    val words = graft.sources.Tables.documents(s, "/root/testdata/sf0.001")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .collect().map(_.getString(0)).toSeq
    check(words, 6)
  }

  test("vocab scale: trainer matches the model at K=64 on the fixture corpus") {
    // The K=6 cases prove semantics; this pins the trainer through a
    // vocab-scale round count — 64 merges exercise the lineage-truncated
    // re-stage chain (persistTruncated) deep enough that a plan-depth
    // or staged-release regression would surface as divergence or blowup.
    val s = spark
    val words = graft.sources.Tables.documents(s, "/root/testdata/sf0.001")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .collect().map(_.getString(0)).toSeq
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (want, _) = modelTrain(freq, 64)
    assert(want.length == 64, s"fixture must support 64 merges, got ${want.length}")
    check(words, 64)
  }

  test("early stop: pairs below the min-frequency floor never merge") {
    // Single word 'ab': the only pair (a,b) has count 1 — below the
    // floor, so training learns NOTHING (the learn_bpe default).
    val (m1, _) = trainSpark(Seq("ab"), 5)
    assert(m1.isEmpty)
    // Two copies clear the floor: one merge, then exhaustion.
    val (m2, _) = trainSpark(Seq("ab", "ab"), 5)
    assert(m2 == Seq(Merge(1, "a", "b", 2)))
  }

  test("train() stages a rolling two-table window, not the K+1 chain") {
    // A K-merge run must release round r−1's word table once round r's
    // has materialized — keeping the chain staged pins K+1 corpus
    // copies, the round-8 advice item. Delta bound: the final state and
    // its direct input stay staged; everything older must be gone.
    val s = spark
    import s.implicits._
    graft.queries.StagedCache.releaseAll()
    val before = graft.queries.StagedCache.stagedCount
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val (merges, _) = BpeTrainer.train(words.toDF("word"), 6)
    assert(merges.length >= 4, "fixture must actually iterate")
    val after = graft.queries.StagedCache.stagedCount
    assert(after - before <= 2,
      s"train(k=6) left ${after - before} staged tables (want <= 2)")
    graft.queries.StagedCache.releaseAll()
  }

  test("delimiter-replace IS greedy merge: exhaustive small-alphabet sweep") {
    // The core equivalence claim, pinned WITHOUT Spark in the loop:
    // replacing `|a||b|` with `|ab|` in the double-delimited form (Java
    // String.replace = left-to-right non-overlapping, the same
    // semantics as DuckDB's replace) equals the reference greedy merge
    // for EVERY symbol sequence — including the run/repeat patterns
    // (`aaaa`, `abab`) where single-delimiter encodings diverge.
    def viaReplace(syms: List[String], a: String, b: String): List[String] = {
      val rep = syms.map(s => s"|$s|").mkString("|", "", "|")
      val out = rep.replace(s"|$a||$b|", s"|$a$b|")
      out.split("\\|\\|").toList.map(_.stripPrefix("|").stripSuffix("|"))
        .filter(_.nonEmpty)
    }
    val alphabet = List("a", "b", "ab")
    // Every sequence over {a, b, ab} up to length 7, merged with every
    // pair over the alphabet: 3^7 · 9 ≈ 20k cases.
    def seqs(n: Int): Iterator[List[String]] =
      if (n == 0) Iterator(Nil)
      else seqs(n - 1).flatMap(t => alphabet.iterator.map(_ :: t))
    var checked = 0
    (0 to 7).iterator.flatMap(seqs).foreach { s =>
      for (a <- alphabet; b <- alphabet) {
        assert(viaReplace(s, a, b) == modelMerge(s, a, b),
          s"divergence on syms=$s pair=($a,$b)")
        checked += 1
      }
    }
    assert(checked > 20000)
  }
}
