package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Typed + default stats-in-log: every supported column gets per-file
  * [min,max] WITHOUT an opt-in, string/date/timestamp bounds prune,
  * and kind mismatches are sound (never prune). Value-level pruning
  * correctness is the q_txn_skip* oracles' job; these pin the file-set
  * and soundness mechanics DuckDB cannot see. */
class TxnStatsSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_tstats_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  test("create/append collect stats BY DEFAULT on long, string, date, " +
       "and timestamp columns; floats are excluded") {
    import spark.implicits._
    val t = freshTable("auto")
    val df = Seq(
      (1L, "alpha", java.sql.Date.valueOf("2020-01-02"),
        java.sql.Timestamp.valueOf("2020-01-02 03:04:05"), 1.5),
      (9L, "omega", java.sql.Date.valueOf("2021-06-07"),
        java.sql.Timestamp.valueOf("2021-06-07 08:09:10"), 2.5))
      .toDF("id", "s", "d", "ts", "f")
    TxnLog.create(spark, t, df.coalesce(1))
    val stats = TxnLog.snapshotFull(spark, t).flatMap(_._2.stats)
    assert(stats.nonEmpty, "create must record default stats")
    val cols = stats.head.cols
    assert(cols("id") === TxnLog.ColStats(1L, 9L, nulls = 0L))
    assert(cols("s").isString && cols("s").minStr === "alpha" &&
      cols("s").maxStr === "omega" && cols("s").nulls === 0L)
    // date → days since epoch; timestamp → micros.
    assert(cols("d").min === java.time.LocalDate.parse("2020-01-02").toEpochDay)
    assert(cols("d").max === java.time.LocalDate.parse("2021-06-07").toEpochDay)
    assert(cols("ts").min ===
      java.sql.Timestamp.valueOf("2020-01-02 03:04:05").getTime * 1000L)
    assert(!cols.contains("f"), "float columns must carry no stats (NaN hazard)")
    // Stats survive the checkpoint/commit round trip byte-exactly:
    // append 1 more commit and re-read the replayed state.
    TxnLog.append(spark, t, df.coalesce(1))
    val replayed = TxnLog.snapshotFull(spark, t).flatMap(_._2.stats)
    assert(replayed.size === 2 && replayed.forall(_.cols("s").isString))
  }

  test("null-count stats: readPrunedNull prunes by null existence, the " +
       "all-null sentinel auto-prunes value reads, and old entries " +
       "without counts stay sound") {
    import spark.implicits._
    val t = freshTable("nulls")
    // Three files: dense (no nulls), mixed, all-null on column v.
    TxnLog.create(spark, t,
      Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v").coalesce(1))
    TxnLog.append(spark, t,
      Seq((3L, Some(30L)), (4L, None: Option[Long])).toDF("id", "v").coalesce(1))
    TxnLog.append(spark, t,
      Seq((5L, None: Option[Long]), (6L, None: Option[Long]))
        .toDF("id", "v").coalesce(1))
    val stats = TxnLog.snapshotFull(spark, t).flatMap(_._2.stats)
    assert(stats.map(_.cols("v").nulls).sorted === Seq(0L, 1L, 2L))
    assert(stats.count(_.cols("v").isAllNull) === 1,
      "the all-null file must carry the empty-range sentinel")
    // IS NOT NULL: the all-null file prunes; answer matches the filter.
    assert(TxnLog.readPrunedNull(spark, t, "v", isNull = false)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // IS NULL: the dense file prunes.
    assert(TxnLog.readPrunedNull(spark, t, "v", isNull = true)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(4L, 5L, 6L))
    // The sentinel auto-prunes VALUE reads of the all-null file.
    assert(TxnLog.readPruned(spark, t, "v", 0L, Long.MaxValue)
      .count() === 3L)
    assert(TxnLog.readPrunedEq(spark, t, "v", Seq(10L, 30L))
      .count() === 2L)
  }

  test("readPrunedString prunes files by UTF-8 bounds and matches the " +
       "plain filter; long pruning over a string column never prunes") {
    import spark.implicits._
    val t = freshTable("strprune")
    // Three files banded by string key.
    TxnLog.create(spark, t,
      Seq(("aa", 1L), ("ab", 2L)).toDF("k", "v").coalesce(1))
    TxnLog.append(spark, t,
      Seq(("mm", 3L), ("mn", 4L)).toDF("k", "v").coalesce(1))
    TxnLog.append(spark, t,
      Seq(("zy", 5L), ("zz", 6L)).toDF("k", "v").coalesce(1))
    val pruned = TxnLog.readPrunedString(spark, t, "k", "ma", "mz")
    assert(pruned.select("v").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 4L))
    assert(pruned.inputFiles.length === 1,
      s"string prune must open one banded file, got ${pruned.inputFiles.length}")
    // A LONG range over the string column cannot use string stats —
    // all files scan, the residual filter still applies (empty result:
    // try_cast of letters is null).
    val longOverString = TxnLog.readPruned(spark, t, "k", 0L, 10L)
    assert(longOverString.count() === 0)
    assert(longOverString.inputFiles.length === 3,
      "kind mismatch must be non-pruning, not wrongly-pruning")
  }

  test("merge prunes by STRING key bounds: only intersecting files " +
       "rewrite, and results are exact") {
    import spark.implicits._
    val t = freshTable("strmerge")
    TxnLog.create(spark, t,
      Seq(("aa", 1L), ("ab", 2L)).toDF("k", "v").coalesce(1))
    TxnLog.append(spark, t,
      Seq(("zy", 5L), ("zz", 6L)).toDF("k", "v").coalesce(1))
    val r = TxnLog.merge(spark, t,
      Seq(("zz", 60L), ("zq", 70L)).toDF("k", "v"), "k", 20)
    assert(r.removed === 1,
      s"merge must rewrite only the z-band file, removed ${r.removed}")
    assert(TxnLog.read(spark, t).as[(String, Long)].collect().toMap ===
      Map("aa" -> 1L, "ab" -> 2L, "zy" -> 5L, "zz" -> 60L, "zq" -> 70L))
  }

  test("date-banded files prune on a days range through readPruned") {
    import spark.implicits._
    val t = freshTable("dateprune")
    def day(s: String) = java.sql.Date.valueOf(s)
    TxnLog.create(spark, t,
      Seq((day("2020-01-01"), 1L), (day("2020-06-01"), 2L))
        .toDF("d", "v").coalesce(1))
    TxnLog.append(spark, t,
      Seq((day("2024-01-01"), 3L), (day("2024-06-01"), 4L))
        .toDF("d", "v").coalesce(1))
    val lo = java.time.LocalDate.parse("2023-01-01").toEpochDay
    val pruned = TxnLog.readPruned(spark, t, "d", lo, Long.MaxValue)
    assert(pruned.inputFiles.length === 1, "2020 file must be pruned")
    // The residual compares the CANONICAL days form, so rows are exact.
    assert(pruned.select("v").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(3L, 4L))
  }
}
