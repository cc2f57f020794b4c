package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GlobalSort, InvertedIndex, WordCount}

/** Property-based kernel checks (SURVEY §5): each kernel against an
  * independent plain-Scala model, plus invariance under input
  * repartitioning (the property the reference relies on implicitly when
  * it splits input across part files).
  *
  * Uses raw ScalaCheck generators with fixed seeds (the offline cache has
  * no scalatestplus bridge); deterministic across runs by construction.
  */
class KernelPropertySpec extends AnyFunSuite with SparkSpec {

  /** Deterministic samples of `gen`. */
  private def samples[A](gen: Gen[A], n: Int = 10, size: Int = 40): Seq[A] =
    (1 to n).map(i =>
      gen.pureApply(Gen.Parameters.default.withSize(size), Seed(i.toLong)))

  private def df(ls: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    ls.toDF("value")
  }

  private val lineGen: Gen[String] =
    Gen.listOf(Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)),
      Gen.oneOf("The", "fox!", "123", "don't", "", "  ")))
      .map(_.mkString(" "))

  private val linesGen: Gen[List[String]] = Gen.listOf(lineGen)

  test("wordcount == brute-force token multiset count") {
    for (ls <- samples(linesGen)) {
      val model = ls.flatMap(_.split("\\s+"))
        .map(_.toLowerCase.replaceAll("[^a-z]", ""))
        .filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = WordCount(df(ls)).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == model, s"input: $ls")
    }
  }

  test("wordcount is invariant under input partitioning") {
    for (ls <- samples(linesGen, n = 5)) {
      val base = WordCount(df(ls)).collect().toSeq
      val re = WordCount(df(ls).repartition(7)).collect().toSeq
      assert(base == re, s"input: $ls")
    }
  }

  test("global sort is an ordered permutation of its input") {
    for (ls <- samples(linesGen)) {
      val got = GlobalSort(df(ls), "value").collect().map(_.getString(0)).toSeq
      assert(got == ls.sorted, s"input: $ls")
    }
  }

  private val pairLineGen: Gen[String] = Gen.oneOf(
    for {
      w <- Gen.oneOf("apple", "banana", "cat", "zebra", "ω")
      d <- Gen.choose(1, 9)
    } yield s"$w\tdoc$d",
    Gen.oneOf("", "   ", "notab", "a b c", "\t"))

  test("inverted index == brute-force group-by-set of well-formed pairs") {
    for (ls <- samples(Gen.listOf(pairLineGen))) {
      val model = ls
        .map(_.replaceAll("^\\s+|\\s+$", "")) // Java-trim incl. tabs
        .filter(l => l.nonEmpty && l.contains("\t"))
        .map { l => val p = l.split("\t", 2); (p(0), p(1)) }
        .distinct
        .groupBy(_._1).view
        .mapValues(_.map(_._2).sorted.mkString(",")).toMap
      val got = InvertedIndex(InvertedIndex.parsePairs(df(ls)))
        .collect().map(r => r.getString(0) -> r.getString(1))
      assert(got.map(_._1).toSeq == got.map(_._1).toSeq.sorted)
      assert(got.toMap == model, s"input: $ls")
    }
  }

  test("salted postings ≡ plain postings on skewed input") {
    for (ls <- samples(Gen.listOf(pairLineGen), n = 5)) {
      val pairs = InvertedIndex.parsePairs(df(ls ++ Seq.fill(50)("hot\tdocX")))
      val plain = InvertedIndex.postings(pairs, col("word"), col("doc_id")).collect().toSeq
      val salted = InvertedIndex.saltedPostings(pairs, col("word"), col("doc_id")).collect().toSeq
      assert(plain == salted, s"input: $ls")
    }
  }

  test("capBuckets preserves membership and splits exactly the over-cap buckets") {
    val s = spark
    import s.implicits._
    val cap = 10
    val rowsGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(0, 120)
      buckets <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "hot"))
    } yield buckets.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    for (rows <- samples(rowsGen, n = 8, size = 60)) {
      val sizes = rows.groupBy(_._2).view.mapValues(_.size).toMap
      val capped = graft.operators.SkewGuard
        .capBuckets(rows.toDF("id", "bucket"), "bucket", col("id"), cap)
        .select("id", "bucket")
        .collect().map(r => r.getLong(0) -> r.getString(1))
      // No row lost or duplicated; every id keeps its original bucket
      // as the key prefix with a salt below the split count.
      assert(capped.length == rows.length, s"input: $rows")
      val orig = rows.toMap
      capped.foreach { case (id, key) =>
        val Array(b, salt) = key.split(":", 2)
        assert(b == orig(id), s"id $id moved bucket: $key")
        val nsplit = math.ceil(sizes(b).toDouble / cap).toLong
        assert(salt.toLong >= 0 && salt.toLong < nsplit, s"salt out of range: $key")
        if (sizes(b) <= cap) assert(salt == "0", s"sub-cap bucket split: $key")
      }
    }
  }

  test("bigram LM score == plain-Scala integer model at sf0.001") {
    // Replays q_bigram_lm's arithmetic sequentially from the same token
    // streams: top-16 vocab (count desc, word), OOV id 0, add-one
    // smoothed -ln P(t2|t1) micro-scaled per TYPE, exact long sums per
    // doc. Bit-identity here pins the distributed plan's determinism
    // claim without the DuckDB oracle in the loop.
    val sf = "/root/testdata/sf0.001"
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val vocab = toks.values.flatten
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(16)
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    val encDocs = toks.view.mapValues(
      _.map(vocab.getOrElse(_, 0L))).filter(_._2.size >= 2).toMap
    val bigrams = encDocs.values.flatMap(ids => ids.zip(ids.tail))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nllU = c2.map { case (bg @ (t1, _), c12) =>
      bg -> math.round(math.log((c1(t1) + 17).toDouble / (c12 + 1)) * 1e6)
    }
    val model = encDocs.map { case (doc, ids) =>
      val bgs = ids.zip(ids.tail)
      val sum = bgs.map(nllU).sum
      // Integer half-away micro-unit mean (the query's exact form).
      val avgU = (sum * 2 + bgs.size) / (2L * bgs.size)
      doc -> ((bgs.size.toLong, sum, avgU))
    }
    val got = graft.SparkEntry.queries("q_bigram_lm")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == model)
  }

  test("DSIR selection == plain-Scala integer model at sf0.001") {
    // Replays q_dsir_select sequentially: both grid-total bigram models
    // (raw corpus / target sources), per-doc exact long ratio sums, and
    // the (w desc, doc_id) top-50 — the selected SET must match.
    val sf = "/root/testdata/sf0.001"
    val targets = Set("src0", "src1", "src2", "src3")
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toVector))
    val vocab = rows.flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(16)
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    val enc = rows.filter(_._3.size >= 2).map { case (id, src, t) =>
      val ids = t.map(vocab.getOrElse(_, 0L))
      (id, src, ids.zip(ids.tail))
    }
    def nllModel(bgs: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
      val c2 = bgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      (for (a <- 0L to 16L; b <- 0L to 16L) yield (a, b) -> math.round(
        math.log((c1.getOrElse(a, 0L) + 17).toDouble /
          (c2.getOrElse((a, b), 0L) + 1)) * 1e6)).toMap
    }
    val raw = nllModel(enc.flatMap(_._3))
    val tgt = nllModel(enc.filter(e => targets(e._2)).flatMap(_._3))
    val expect = enc.filterNot(e => targets(e._2)).map { case (id, src, bgs) =>
      val w = bgs.map(bg => raw(bg) - tgt(bg)).sum
      // Sign-symmetric half-away integer mean (the query's exact form).
      val n = bgs.size.toLong
      val avgU = if (w >= 0) (w * 2 + n) / (2 * n) else -((-w * 2 + n) / (2 * n))
      (id, src, n, w, avgU)
    }.sortBy { case (id, _, _, w, _) => (-w, id) }.take(50).toSet
    val got = graft.SparkEntry.queries("q_dsir_select")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expect)
  }

  test("NB classifier == plain-Scala integer model at sf0.001") {
    // Replays q_nb_classify sequentially: top-16 unigram vocab, grid-
    // total per-class token counts, micro-scaled smoothed NLLs, doc-
    // count priors, exact long log-odds and the 0-tie → 'rest' label.
    val sf = "/root/testdata/sf0.001"
    val targets = Set("src0", "src1", "src2", "src3")
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toVector))
    val vocab = rows.flatMap(_._3)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(16)
      .zipWithIndex.map { case ((w, _), i) => w -> (i + 1).toLong }.toMap
    val enc = rows.map { case (id, src, t) =>
      (id, src, t.map(vocab.getOrElse(_, 0L))) }
    val tokRows = enc.flatMap { case (_, src, tids) => tids.map(src -> _) }
    def classCounts(p: String => Boolean): Map[Long, Long] =
      tokRows.filter(r => p(r._1)).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def nllModel(c: Map[Long, Long]): Map[Long, Long] = {
      val n = c.values.sum
      (0L to 16L).map(t => t -> math.round(
        math.log((n + 17).toDouble / (c.getOrElse(t, 0L) + 1)) * 1e6)).toMap
    }
    val nllTgt = nllModel(classCounts(targets))
    val nllRest = nllModel(classCounts(s => !targets(s)))
    val dTgt = rows.count(r => targets(r._2)).toLong
    val dRest = rows.size - dTgt
    def prior(dc: Long) =
      math.round(math.log((dTgt + dRest + 2).toDouble / (dc + 1)) * 1e6)
    val expect = enc.map { case (id, src, tids) =>
      val lo = (prior(dRest) + tids.map(nllRest).sum) -
        (prior(dTgt) + tids.map(nllTgt).sum)
      (id, src, tids.size.toLong, lo, if (lo > 0) "tgt" else "rest")
    }.toSet
    val got = graft.SparkEntry.queries("q_nb_classify")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == expect)
    // The classifier separates: target-domain docs skew positive.
    val preds = got.toSeq.groupBy(r => targets(r._2))
      .view.mapValues(rs => rs.count(_._5 == "tgt").toDouble / rs.size).toMap
    assert(preds(true) > preds(false))
  }

  test("µ-unit half-away mean survives planted half-point denominators") {
    // The q_kmeans/q_ann_ivf centroid mean: sq µ-units over n members,
    // carried as the half-away INTEGER division the queries use. Plant
    // (sq, n) pairs where sq/n lands EXACTLY on x.5 µ-units — n even
    // (2·odd, 4·odd, 8·odd) and |sq| ≡ n/2 (mod n) — the tie a 6-dp
    // double mean resolves engine-dependently (the r7 q_kmeans red
    // cell). Assert the SQL expression matches BigDecimal HALF_UP
    // (half away from zero) and that the derived double centroid
    // round-trips to the same integer.
    val s = spark
    import s.implicits._
    val cases = for {
      base <- Seq(2L, 4L, 8L)
      odd <- Seq(1L, 3L, 7L)
      k <- Seq(0L, 1L, 5L, 1234567L)
      sign <- Seq(1L, -1L)
      n = base * odd
      half <- Seq(n / 2, 0L, 1L, n - 1L) // exact half + off-half controls
    } yield (sign * (k * n + half), n)
    val got = cases.toDF("sq", "n")
      .withColumn("cvp_u", expr("CAST(CASE WHEN sq >= 0" +
        " THEN (sq * 2 + n) DIV (2 * n)" +
        " ELSE -((-sq * 2 + n) DIV (2 * n)) END AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((sq, n) <- cases) {
      val expect = BigDecimal(sq).bigDecimal
        .divide(java.math.BigDecimal.valueOf(n), 0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
      assert(got((sq, n)) == expect,
        s"half-away mean of sq=$sq n=$n: got ${got((sq, n))}, want $expect")
      // Round-trip: the derived double centroid recovers the integer.
      assert(math.round(got((sq, n)).toDouble / 1e6 * 1e6) == got((sq, n)),
        s"derived double does not round-trip for sq=$sq n=$n")
    }
  }

  test("upsertCompact == last-writer-wins map fold, any batch split") {
    // Model: fold the FULL log by (key, seq) — highest seq wins, a
    // winning delete removes the key. The kernel must agree no matter
    // how the log is split into micro-batches and no matter the
    // arrival order of the batches' contents (CDC logs interleave).
    val s = spark
    import s.implicits._
    val logGen = Gen.listOfN(60, for {
      k <- Gen.choose(0L, 9L)
      seq <- Gen.choose(1L, 30L)
      op <- Gen.frequency(6 -> Gen.const("U"), 2 -> Gen.const("N"),
        2 -> Gen.const("D"))
      v <- Gen.choose(0L, 999L)
    } yield (k, seq, op, v))
    samples(logGen, n = 6).foreach { log0 =>
      // Distinct (key, seq): the kernel's contract is a unique CDC
      // sequence per key (real logs have one), ties are undefined.
      val log = log0.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val winners = log.groupBy(_._1).map { case (k, rs) => rs.maxBy(_._2) }
      val expect = winners.filter(_._3 != "D")
        .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
      // Split into 3 "micro-batches" by index and fold the kernel.
      val batches = log.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      var target = Seq.empty[(Long, Long, String, Long)]
        .toDF("k", "seq", "op", "v")
      batches.foreach { b =>
        target = graft.streaming.StreamingKernels
          .upsertCompact(target, b.toDF("k", "seq", "op", "v"), "k", "seq")
      }
      val got = graft.streaming.StreamingKernels.upsertRead(target).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3))))
        .toMap
      assert(got == expect, s"log=$log")
    }
  }
}
