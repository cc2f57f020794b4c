package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Tables, TxnLog}

/** SHALLOW CLONE pins: a clone's version-0 commit references the
  * source's files IN PLACE (external URI entries), so nothing here is
  * visible to the DuckDB oracle — these tests pin the physical
  * contract: zero data copied at clone time, copy-on-write
  * localization under DML, vacuum-on-clone never reaching the source,
  * DV masks and partition segments surviving the external encoding,
  * and the independence of the two histories. */
class CloneSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def freshDir(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_clone_${spark.sparkContext.applicationId}_$tag"
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }
  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "n_chars")

  /** Data files physically under `dir` (recursive), as path strings. */
  private def physicalParquet(dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Set.empty
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.Set.empty[String]
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.toString.contains("/_log/")) out += s.getPath.toString
    }
    out.toSet
  }

  test("clone copies no data, reads the source in place, and the two " +
       "histories diverge independently") {
    val src = freshDir("basic_src")
    val dst = freshDir("basic_dst")
    TxnLog.create(spark, src, docs.repartition(3))
    val srcFilesBefore = physicalParquet(src)
    TxnLog.clone(spark, src, dst)
    assert(physicalParquet(dst).isEmpty, "a shallow clone stages no data files")
    assert(TxnLog.read(spark, dst).count() === docs.count())
    // Every clone entry is external and carries the source's stats.
    val snap = TxnLog.snapshotFull(spark, dst)
    assert(snap.nonEmpty && snap.forall { case (p, st) =>
      TxnLog.isExternal(p) && st.stats.isDefined })
    // Diverge the clone: append + delete touch ONLY the clone.
    TxnLog.append(spark, dst, docs.limit(5).withColumn("doc_id",
      col("doc_id") + 1000000))
    TxnLog.delete(spark, dst, col("lang") === "en")
    assert(TxnLog.read(spark, src).count() === docs.count(),
      "source content never moves with the clone")
    assert(physicalParquet(src) === srcFilesBefore,
      "no DML on the clone may create or remove source files")
    val expectClone = docs.count() + 5 -
      docs.filter(col("lang") === "en").count()
    assert(TxnLog.read(spark, dst).count() === expectClone)
    // Time travel is independent: the clone's v0 is the clone point.
    assert(TxnLog.read(spark, dst, Some(0)).count() === docs.count())
    // Diverge the source: the clone still reads the files it pinned.
    TxnLog.delete(spark, src, col("lang") =!= "en")
    assert(TxnLog.read(spark, dst, Some(0)).count() === docs.count(),
      "a LOGICAL source change (log-only) must not affect the clone")
  }

  test("OPTIMIZE localizes the clone; vacuum on the localized clone " +
       "reclaims only under its own root") {
    val src = freshDir("loc_src")
    val dst = freshDir("loc_dst")
    TxnLog.create(spark, src, docs.repartition(4))
    val srcFiles = physicalParquet(src)
    TxnLog.clone(spark, src, dst)
    TxnLog.compact(spark, dst, targetFiles = 1)
    val snap = TxnLog.snapshotFull(spark, dst)
    assert(snap.nonEmpty && snap.forall { case (p, _) => !TxnLog.isExternal(p) },
      "compaction must replace every external entry with a local file")
    assert(TxnLog.read(spark, dst).count() === docs.count())
    // Vacuum the clone to one retained version with no age guard: the
    // external entries it dropped are NOT under its root — the
    // source's files must all survive.
    TxnLog.vacuum(spark, dst, retainVersions = 1, retainMillis = 0L)
    assert(physicalParquet(src) === srcFiles,
      "vacuum on a clone may only ever delete under the clone's root")
    assert(TxnLog.read(spark, dst).count() === docs.count())
  }

  test("a DV-masked source clones with its mask: deleted rows stay " +
       "deleted on the clone and further MoR deletes compose") {
    val src = freshDir("dv_src")
    val dst = freshDir("dv_dst")
    TxnLog.create(spark, src, docs.repartition(2))
    TxnLog.deleteMoR(spark, src, col("doc_id") % 10 === 0)
    val expectSrc = docs.filter(col("doc_id") % 10 =!= 0).count()
    TxnLog.clone(spark, src, dst)
    assert(TxnLog.read(spark, dst).count() === expectSrc,
      "the source's deletion vector must mask the clone's scan")
    TxnLog.deleteMoR(spark, dst, col("doc_id") % 10 === 1)
    val expectClone = docs
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1).count()
    assert(TxnLog.read(spark, dst).count() === expectClone)
    assert(TxnLog.read(spark, src).count() === expectSrc,
      "the clone's new mask must not reach the source")
  }

  test("a partitioned source's clone decodes partition values through " +
       "the external encoding — special characters included — and " +
       "partition DML stays clone-local") {
    import spark.implicits._
    val src = freshDir("part_src")
    val dst = freshDir("part_dst")
    // A partition value with a space AND a colon: hive-escaped on
    // disk, URI-encoded again inside the external entry.
    val df = Seq((1L, "plain"), (2L, "plain"), (3L, "a b:c"), (4L, "a b:c"),
      (5L, "zz")).toDF("id", "grp")
    TxnLog.createPartitioned(spark, src, df, Seq("grp"))
    TxnLog.clone(spark, src, dst)
    assert(TxnLog.read(spark, dst).select("id", "grp").as[(Long, String)]
      .collect().toSet === Set((1L, "plain"), (2L, "plain"), (3L, "a b:c"),
        (4L, "a b:c"), (5L, "zz")),
      "partition values must decode identically through external entries")
    // Partition-pruned read binds by the path segment on externals.
    assert(TxnLog.readPrunedPartition(spark, dst, "grp", Seq("a b:c"))
      .count() === 2)
    // dropPartition on the clone is log-only and clone-local.
    val srcFiles = physicalParquet(src)
    TxnLog.dropPartition(spark, dst, "grp", "a b:c")
    assert(TxnLog.read(spark, dst).select("grp").distinct()
      .as[String].collect().toSet === Set("plain", "zz"))
    assert(physicalParquet(src) === srcFiles)
    assert(TxnLog.read(spark, src).count() === 5)
  }

  test("the clone composes with the rest of the surface: CDC reports " +
       "its v0 as inserts and the streaming source tails it — both " +
       "through external entries") {
    val src = freshDir("cdc_src")
    val dst = freshDir("cdc_dst")
    TxnLog.create(spark, src, docs.limit(40).repartition(2))
    TxnLog.clone(spark, src, dst)
    // CDC across a clone-side COW delete: the diff reads the EXTERNAL
    // victim files (pre-image) against their local survivor copies.
    val toDelete = TxnLog.read(spark, dst)
      .filter(col("doc_id") % 4 === 0).count()
    TxnLog.delete(spark, dst, col("doc_id") % 4 === 0)
    val cdc = TxnLog.changes(spark, dst, 0, 1)
    assert(cdc.filter(col("_change") === "delete").count() === toDelete)
    assert(cdc.filter(col("_change") === "insert").count() === 0,
      "survivor copies must cancel against their external pre-images")
    // The streaming source tails the clone from its v0 — the initial
    // batch reads the external entries, later commits are local.
    val afterDelete = 40 - toDelete
    val q = spark.readStream.format("graft-txn").load(dst)
      .writeStream.format("memory").queryName("clone_tail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("clone_tail").count() >= afterDelete,
        "the source must deliver at least the clone-point rows")
      TxnLog.append(spark, dst, docs.limit(3)
        .withColumn("doc_id", col("doc_id") + 900000))
      q.processAllAvailable()
      val n = spark.table("clone_tail").count()
      assert(n >= afterDelete + 3, s"append batch missing: $n")
    } finally q.stop()
  }

  test("table-level sidecars ride along: the clone's own writes keep " +
       "publishing bloom sidecars under the inherited column config") {
    val src = freshDir("bloom_src")
    val dst = freshDir("bloom_dst")
    TxnLog.createWithBloom(spark, src, docs.repartition(2), Seq("doc_id"))
    TxnLog.clone(spark, src, dst)
    assert(graft.sources.TxnBloom.configuredCols(spark, dst) ===
      Seq("doc_id"), "the bloom column config must ride into the clone")
    // A fresh append to the CLONE publishes sidecars for its files —
    // the external files have none and always scan (sound), so the
    // probe must prune to at most the appended file count for an
    // appended-only key.
    TxnLog.append(spark, dst,
      docs.limit(1).withColumn("doc_id", lit(777000111L)))
    val hit = TxnLog.readPrunedEq(spark, dst, "doc_id", Seq(777000111L))
    assert(hit.count() === 1)
  }

  test("clone pins a VERSION, a clone clones, and the refusals are " +
       "loud: existing destination log, non-txn source") {
    val src = freshDir("v_src")
    val dst0 = freshDir("v_dst0")
    val dst1 = freshDir("v_dst1")
    TxnLog.create(spark, src, docs.filter(col("doc_id") < 50))   // v0
    TxnLog.append(spark, src, docs.filter(col("doc_id") >= 50))  // v1
    val v0Count = docs.filter(col("doc_id") < 50).count()
    TxnLog.clone(spark, src, dst0, version = Some(0))
    assert(TxnLog.read(spark, dst0).count() === v0Count,
      "VERSION AS OF clones the pinned snapshot, not the tip")
    // Clone of a clone: external entries pass through unchanged.
    TxnLog.clone(spark, dst0, dst1)
    assert(TxnLog.read(spark, dst1).count() === v0Count)
    val again = intercept[IllegalArgumentException] {
      TxnLog.clone(spark, src, dst0)
    }
    assert(again.getMessage.contains("already carries a transaction log"))
    val notTxn = freshDir("v_plain")
    docs.limit(3).write.parquet(notTxn)
    val bad = intercept[IllegalArgumentException] {
      TxnLog.clone(spark, notTxn, freshDir("v_dst2"))
    }
    assert(bad.getMessage.contains("not a TxnLog table"))
  }
}
