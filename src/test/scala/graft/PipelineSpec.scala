package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{PipelineQueries, VectorQueries}

/** Pins the pipeline-maintenance band (q_merge_upsert / q_pii_redact /
  * q_url_normalize) and q_semdedup on invariants the oracle hash can't
  * see: winner-per-key semantics, redaction completeness, normalization
  * idempotence, and the SemDeDup drop rule.
  */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private object EventQueriesAccess {
    def drift(s: org.apache.spark.sql.SparkSession, d: String)
        : Array[(Long, Long, Long, Long, Long, Long)] =
      graft.queries.EventQueries.queries("q_drift_tvd")(s, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
  }

  test("q_merge_upsert: delta wins per key, inserts extend the key range") {
    // The insert shift is max(base key) + 1, computed from the data —
    // recompute it here so the invariants hold at ANY input scale
    // (a literal threshold broke against the 10x Inflate).
    val maxBase = graft.sources.Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.max("o_orderkey"))
      .collect()(0).getLong(0)
    val rows = PipelineQueries.queries("q_merge_upsert")(spark, sf).collect()
    val byKey = rows.map(r => r.getLong(0) -> r).toMap
    assert(byKey.size == rows.length, "upsert key must be unique")
    // Every 97th key is an update that won over its base row.
    val upd = rows.filter(r => r.getLong(0) % 97 == 0 && r.getLong(0) <= maxBase)
    assert(upd.nonEmpty)
    assert(upd.forall(r => r.getString(1) == "U" && r.getString(3) == "delta"))
    // Inserts live strictly past the base key range, carry base prices.
    val ins = rows.filter(_.getLong(0) > maxBase)
    assert(ins.nonEmpty)
    assert(ins.forall(r => r.getString(1) == "N" && r.getString(3) == "delta"))
    // Untouched keys keep their base row.
    val untouched = rows.filter(r =>
      r.getLong(0) % 97 != 0 && r.getLong(0) <= maxBase)
    assert(untouched.forall(_.getString(3) == "base"))
  }

  test("q_pii_redact: planted PII is counted and the redacted blob is clean") {
    val rows = PipelineQueries.queries("q_pii_redact")(spark, sf).collect()
    rows.foreach { r =>
      val (id, nEmails, nPhones) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nPhones == 1L, s"doc $id phones")
      assert(nEmails == (if (id % 3 == 0) 2L else 1L), s"doc $id emails")
    }
    // Redaction is complete: a second pass over the redacted blob finds
    // nothing, so its fingerprint is a fixed point. The blob and
    // patterns are the QUERY's own shared definitions — an inline copy
    // here would silently keep verifying an outdated surface.
    import org.apache.spark.sql.functions._
    val redacted = PipelineQueries.piiRedact(PipelineQueries.piiBlob)
    val leftover = graft.sources.Tables.documents(spark, sf)
      .select((regexp_count(redacted, lit(PipelineQueries.piiEmail)) +
        regexp_count(redacted, lit(PipelineQueries.piiPhone))).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(leftover == 0L, "redacted blob must contain no residual PII")
  }

  test("q_url_normalize: canonical form is lowercase, portless, query-free") {
    val rows = PipelineQueries.queries("q_url_normalize")(spark, sf).collect()
    rows.foreach { r =>
      val (host, path, norm) = (r.getString(1), r.getString(2), r.getString(3))
      assert(host.endsWith(".example.com") && host == host.toLowerCase)
      assert(path.startsWith("/") && !path.contains("?") && !path.contains("#"))
      assert(norm == s"https://$host$path" && !norm.contains(":443"))
    }
  }

  test("q_mv_incremental: state+delta merge equals the from-scratch aggregate") {
    import org.apache.spark.sql.functions._
    val merged = PipelineQueries.queries("q_mv_incremental")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val scratch = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("q"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("p"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(merged == scratch, "incremental maintenance must not drift")
  }

  test("q_scd2: validity intervals tile each key's history") {
    val rows = PipelineQueries.queries("q_scd2")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(3), r.getDate(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (k, hist) =>
      // Already emitted in (valid_from, key) order; intervals must chain.
      hist.sliding(2).foreach {
        case Array((_, _, to1, _), (_, from2, _, _)) =>
          assert(to1 == from2, s"key $k: gap/overlap between $to1 and $from2")
        case _ =>
      }
      assert(hist.count(_._4) == 1, s"key $k: exactly one current row")
      assert(hist.last._3.toString == "9999-12-31")
      hist.foreach { case (_, from, to, _) =>
        assert(from.before(to) || from == to,
          s"key $k: inverted interval $from..$to")
      }
    }
  }

  test("q_snapshot_diff: the diff reconciles with the delta that built v2") {
    import org.apache.spark.sql.functions._
    val base = graft.sources.Tables.orders(spark, sf)
    val nBase = base.count()
    val nIns = base.filter(col("o_orderkey") % 101 === 0).count()
    val nUpd = base.filter(col("o_orderkey") % 97 === 0).count()
    val got = PipelineQueries.queries("q_snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("added")._1 == nIns, "every insert appears as added")
    // Every %97 key flips status to 'U' (and bumps price), so all are
    // changed; nothing is removed by this delta.
    assert(got("changed")._1 == nUpd)
    assert(!got.contains("removed"))
    assert(got("unchanged")._1 == nBase - nUpd)
    assert(got("unchanged")._2 == 0L, "unchanged rows move no money")
    assert(got("changed")._2 > 0L, "the +10% updates move money up")
  }

  test("q_drift_tvd: shares partition unity, TVD bounded") {
    val rows = EventQueriesAccess.drift(spark, sf)
    val (sumP, sumQ) = (rows.map(_._4).sum, rows.map(_._5).sum)
    // Half-away per-bucket rounding keeps each share sum within
    // #buckets micro-units of exactly 1.
    assert(math.abs(sumP - 1000000L) <= rows.length, s"p_u sum $sumP")
    assert(math.abs(sumQ - 1000000L) <= rows.length, s"q_u sum $sumQ")
    val tvdU = rows.map(_._6).sum / 2
    assert(tvdU >= 0L && tvdU <= 1000000L)
    rows.foreach { case (b, _, _, p, q, d) =>
      assert(d == math.abs(p - q), s"bucket $b")
    }
  }

  test("q_mix_temperature: sqrt-weighted rates, planned total within budget") {
    val rows = PipelineQueries.queries("q_mix_temperature")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, wU, _, _) =>
      assert(wU == math.round(math.sqrt(n.toDouble) * 1e6), s"source $src")
    }
    // Rates are a (half-away-rounded) partition of unity; planned
    // floor'd counts never exceed the budget.
    val rateSum = rows.map(_._4).sum
    assert(math.abs(rateSum - 1000000L) <= rows.length,
      s"rates sum to $rateSum")
    assert(rows.map(_._5).sum <= 200L)
    // Temperature flattens: a bigger source never gets a SMALLER rate,
    // and rate ratios are damped vs count ratios.
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Array((_, n1, _, r1, _), (_, n2, _, r2, _)) =>
        if (n1 < n2) assert(r1 <= r2)
      case _ =>
    }
    val (minR, maxR) = (sorted.head, sorted.last)
    if (minR._2 < maxR._2) {
      assert(maxR._4.toDouble / minR._4 <= maxR._2.toDouble / minR._2,
        "temperature must damp the size ratio")
    }
  }

  test("q_domain_cap: at most cap admitted per host, lowest doc_ids win") {
    val rows = PipelineQueries.queries("q_domain_cap")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (host, docs) =>
      val admitted = docs.filter(_._4).map(_._1).sorted
      assert(admitted.length <= 20, s"$host over cap")
      val lowest = docs.map(_._1).sorted.take(admitted.length)
      assert(admitted.toSeq == lowest.toSeq,
        s"$host: admitted set must be the lowest doc_ids")
    }
  }

  test("q_semdedup: drop rule — dropped iff a lower-id in-cell neighbor ≥ τ") {
    val rows = VectorQueries.queries("q_semdedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val dropped = rows.filter(_.getString(1) == "dropped")
    val kept = rows.filter(_.getString(1) == "kept")
    assert(kept.nonEmpty, "semdedup must keep representatives")
    dropped.foreach { r =>
      assert(r.getLong(2) < r.getLong(0), "representative has a lower id")
      assert(r.getDouble(3) >= 0.35, "dropped only at or above τ")
      assert(r.getLong(4) >= 1L)
    }
    kept.foreach { r =>
      assert(r.getLong(2) == -1L && r.getDouble(3) == 0.0 && r.getLong(4) == 0L)
    }
  }

  test("q_boilerplate_strip matches an independent model; headers always go") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // Plain-Scala model of the operator (the GoldenKernelSpec pattern):
    // normalize, chunk in 8s, df >= 3 over FULL chunks, strip, rejoin.
    def toks(s: String): Array[String] =
      s.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
    val chunked = docs.map { case (id, src, text) =>
      val t = toks(s"standard promo header from $src all rights reserved $text")
      val chunks = (0 to (t.length - 1) / 8).map { i =>
        (i, t.slice(i * 8, i * 8 + 8).mkString(" "), (i + 1) * 8 <= t.length)
      }
      id -> chunks
    }
    val boiler = chunked.flatMap { case (id, cs) =>
        cs.filter(_._3).map(c => (c._2, id))
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
      .filter(_._2 >= 3).keySet
    val expected = chunked.map { case (id, cs) =>
      val kept = cs.filterNot(c => boiler.contains(c._2))
      id -> (cs.size.toLong, kept.size.toLong, kept.map(_._2).mkString(" "))
    }.toMap

    val rows = PipelineQueries.queries("q_boilerplate_strip")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.length == docs.length, "one output row per document")
    rows.foreach { case (id, nChunks, nKept, keptText) =>
      val (eChunks, eKept, eText) = expected(id)
      assert(nChunks == eChunks, s"doc $id: n_chunks")
      assert(nKept == eKept, s"doc $id: n_kept")
      assert(keptText == eText, s"doc $id: kept_text")
      // The planted per-source header (df = docs-per-source >= 3) must
      // never survive.
      assert(!keptText.contains("standard promo header from"),
        s"doc $id: header survived the strip")
    }
    // The strip must not be vacuous in either direction: every doc loses
    // its header, and most docs keep their (unique) body.
    assert(rows.forall(r => r._3 < r._2), "every doc drops at least the header")
    assert(rows.count(r => r._3 == r._2 - 1) > rows.length / 2,
      "most docs should lose ONLY the header")
  }
}
