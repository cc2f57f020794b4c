package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Adversarial spec for the snapshot ResolveCache (and the history
  * row cache): a correctness-bearing cache in the commit path must
  * prove warm ≡ cold across every DML verb, prefix-seeded ≡ full
  * replay on long chains, loud failure on cleaned versions, a miss on
  * drop/recreate at the same path, and exact accounting under
  * eviction — the round-17 verdict's "shipped untested" gap. */
class ResolveCacheSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_rescache_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  /** Everything the cache stores, per version: full file states and
    * the recorded schema. */
  private def stateAt(t: String, v: Option[Long]) =
    (TxnLog.snapshotFull(spark, t, v), TxnLog.tableSchema(spark, t, v))

  test("warm ≡ cold file states and schema across every DML verb") {
    import spark.implicits._
    val t = freshTable("verbs")
    TxnLog.create(spark, t, (0L to 9L).map(i => (i, s"r$i")).toDF("id", "s"))
    TxnLog.append(spark, t, (10L to 14L).map(i => (i, s"r$i")).toDF("id", "s"))
    TxnLog.delete(spark, t, col("id") === 3L)                       // COW delete
    TxnLog.deleteMoR(spark, t, col("id") === 7L)                    // DV delete
    TxnLog.updateMoR(spark, t, col("id") === 11L,                   // DV update
      Map("s" -> lit("upd")))
    TxnLog.merge(spark, t,                                           // upsert
      Seq((1L, "m1"), (99L, "m99")).toDF("id", "s"), "id")
    TxnLog.compact(spark, t, targetFiles = 1)                        // rewrite
    val latest = TxnLog.latestVersion(spark, t)
    assert(latest >= 6L)
    // Warm: every version resolves through whatever the verbs cached.
    val warm = (0L to latest).map(v => stateAt(t, Some(v))) :+ stateAt(t, None)
    TxnLog.clearResolveCache()
    val cold = (0L to latest).map(v => stateAt(t, Some(v))) :+ stateAt(t, None)
    assert(warm === cold)
    // And the data itself survives the round trip.
    assert(TxnLog.read(spark, t).count() === 14L) // 15 − del − MoRdel + merge-insert
  }

  test("prefix-seeded resolve ≡ full replay on a 20-commit chain") {
    import spark.implicits._
    val t = freshTable("chain")
    TxnLog.create(spark, t, Seq((0L, "r0")).toDF("id", "s"))
    (1L to 20L).foreach { i =>
      TxnLog.append(spark, t, Seq((i, s"r$i")).toDF("id", "s"))
      // Resolve the tip after every commit so each version's state is
      // cached and the NEXT resolve takes the longest-cached-prefix
      // seeding path ("state at v−1 + parse one commit").
      TxnLog.snapshotFull(spark, t)
    }
    val seeded = stateAt(t, None)
    TxnLog.clearResolveCache()
    val full = stateAt(t, None)
    assert(seeded === full)
    // Order matters too (live-set replay order is deterministic).
    assert(seeded._1.map(_._1) === full._1.map(_._1))
  }

  test("a cleanupLog'd version still fails loudly, even if cached before") {
    import spark.implicits._
    val t = freshTable("cleaned")
    TxnLog.create(spark, t, Seq((0L, "r0")).toDF("id", "s"))
    (1L to 24L).foreach(i =>
      TxnLog.append(spark, t, Seq((i, s"r$i")).toDF("id", "s")))
    // Cache v5's state while it is still resolvable.
    assert(TxnLog.snapshotFull(spark, t, Some(5L)).nonEmpty)
    TxnLog.cleanupLog(spark, t, retainVersions = 5)
    // The fresh listing's require runs BEFORE any cache lookup, so the
    // cached v5 entry must not resurrect the cleaned version.
    val e = intercept[IllegalArgumentException] {
      TxnLog.snapshotFull(spark, t, Some(5L))
    }
    assert(e.getMessage.contains("cleaned"))
    // The retained window still resolves, warm and cold.
    val warm = stateAt(t, Some(22L))
    TxnLog.clearResolveCache()
    assert(stateAt(t, Some(22L)) === warm)
  }

  test("drop + recreate at the same path serves the NEW incarnation") {
    import spark.implicits._
    val t = freshTable("recreate")
    TxnLog.create(spark, t, Seq((1L, "old")).toDF("id", "s"))
    val oldFiles = TxnLog.snapshot(spark, t) // primes the cache
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    // Recreate immediately — same path, possibly the same mtime granule;
    // the v0 publish invalidates this table's cache entries in-process.
    TxnLog.create(spark, t, Seq((2L, "new"), (3L, "new")).toDF("id", "s"))
    val rows = TxnLog.read(spark, t).select("id").as[Long].collect().sorted
    assert(rows.toSeq === Seq(2L, 3L))
    assert(TxnLog.snapshot(spark, t) !== oldFiles)
  }

  test("eviction keeps entry and byte accounting exact") {
    import spark.implicits._
    TxnLog.clearResolveCache()
    assert(TxnLog.resolveCacheEntryCount === 0)
    assert(TxnLog.resolveCacheApproxBytes === 0L)
    val t = freshTable("evict")
    TxnLog.create(spark, t, Seq((0L, "r0")).toDF("id", "s"))
    (1L to 70L).foreach(i =>
      TxnLog.append(spark, t, Seq((i, s"r$i")).toDF("id", "s")))
    // Resolve every version: > maxEntries distinct snapshots.
    (0L to 70L).foreach(v => TxnLog.snapshotFull(spark, t, Some(v)))
    assert(TxnLog.resolveCacheEntryCount <= 64,
      s"entry cap violated: ${TxnLog.resolveCacheEntryCount}")
    assert(TxnLog.resolveCacheApproxBytes > 0L)
    // Evicted versions still resolve correctly (cold path).
    assert(TxnLog.snapshotWithStats(spark, t, Some(0L)).size === 1)
    assert(TxnLog.read(spark, t).count() === 71L)
    TxnLog.clearResolveCache()
    assert(TxnLog.resolveCacheEntryCount === 0)
    assert(TxnLog.resolveCacheApproxBytes === 0L)
  }

  test("history(): warm ≡ cold, and new commits appear incrementally") {
    import spark.implicits._
    val t = freshTable("hist")
    TxnLog.create(spark, t, Seq((0L, "r0")).toDF("id", "s"))
    (1L to 5L).foreach(i =>
      TxnLog.append(spark, t, Seq((i, s"r$i")).toDF("id", "s")))
    TxnLog.deleteMoR(spark, t, col("id") === 2L)
    val warm = TxnLog.history(spark, t).collect().map(_.toSeq)
    TxnLog.clearHistoryCache()
    val cold = TxnLog.history(spark, t).collect().map(_.toSeq)
    assert(warm === cold)
    assert(cold.head(2) === "DELETE (merge-on-read)") // newest first
    // A new commit shows up on the next (cached) call.
    TxnLog.append(spark, t, Seq((9L, "r9")).toDF("id", "s"))
    val after = TxnLog.history(spark, t).collect()
    assert(after.length === warm.length + 1)
    assert(after.head.getString(2) === "APPEND")
    assert(after.head.getLong(0) === 7L)
  }
}
