package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Ingestion-time clustering (cluster-on-write) pins: with the flag
  * on, appends and COPY INTO to a CLUSTER BY table land range-
  * clustered files stamped clustered-at, the bare (incremental)
  * OPTIMIZE finds NOTHING to rewrite for them, per-file stats bounds
  * are narrow from the first read, and with the flag off (the
  * default) nothing changes. */
class ClusterOnWriteSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_cow_${spark.sparkContext.applicationId}_$tag"
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  /** A CLUSTER BY (k) table: create through the same field-metadata
    * recording the catalog's CREATE uses. */
  private def clusteredTable(tag: String): String = {
    import spark.implicits._
    val t = freshDir(tag)
    val df = Seq((0L, "seed")).toDF("k", "s")
    val schema = org.apache.spark.sql.types.StructType(df.schema.fields.map {
      case f if f.name == "k" => f.copy(metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong(TxnLog.ClusterColKey, 0L).build())
      case f => f
    })
    TxnLog.create(spark, t, spark.createDataFrame(df.rdd, schema))
    t
  }

  private def batch(n: Int) = {
    import spark.implicits._
    // Deterministically shuffled key order: an unclustered write would
    // give every file the full [0, n) span.
    new scala.util.Random(42).shuffle((1 to n).toList)
      .map(i => (i.toLong, s"s$i")).toDF("k", "s").repartition(4)
  }

  /** Run `body` with cluster-on-write enabled and AQE's advisory
    * partition size shrunk so the tiny fixture still splits into
    * several range partitions (at real scale the default 64 MB does
    * this job). */
  private def withClusterWrite[A](body: => A): A = {
    spark.conf.set(TxnLog.ClusterOnWriteConf, "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "1024")
    try body
    finally {
      spark.conf.unset(TxnLog.ClusterOnWriteConf)
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    }
  }

  test("flag on: appended files are stamped clustered-at and the bare " +
       "incremental OPTIMIZE rewrites nothing") {
    val t = clusteredTable("stamp")
    withClusterWrite { TxnLog.append(spark, t, batch(4000)) }
    val marked = TxnLog.snapshotFull(spark, t).filter(_._2.cl.isDefined)
    assert(marked.nonEmpty, "appended files must carry clustered-at markers")
    val before = TxnLog.snapshot(spark, t).toSet
    val r = TxnLog.clusterIncremental(spark, t, Seq(col("k")))
    // Only the seed file (written before the flag) may rewrite.
    assert(r.removed <= 1,
      s"incremental OPTIMIZE must skip write-clustered files, rewrote ${r.removed}")
    assert(marked.map(_._1).toSet.subsetOf(TxnLog.snapshot(spark, t).toSet),
      "write-clustered files must survive the incremental pass untouched")
    assert(before.nonEmpty)
  }

  test("flag on: per-file k-spans are narrow (range-clustered layout)") {
    val t = clusteredTable("span")
    withClusterWrite { TxnLog.append(spark, t, batch(4000)) }
    val spans = TxnLog.snapshotWithStats(spark, t).flatMap(_._2)
      .flatMap(_.cols.get("k")).map(cs => cs.max - cs.min)
      .filter(_ > 1) // ignore the seed file
    assert(spans.nonEmpty)
    // Range clustering splits [1,4000] across the shuffle partitions:
    // every file's span must be far below the full range.
    assert(spans.forall(_ < 3000),
      s"expected narrow per-file spans, got $spans")
    // Disjointness up to boundary overlap: total span coverage ~ range.
    assert(spans.sum <= 4200, s"spans overlap too much: $spans")
  }

  test("flag off (default): appends stay unmarked and OPTIMIZE rewrites " +
       "them — behavior unchanged") {
    val t = clusteredTable("off")
    TxnLog.append(spark, t, batch(1000))
    assert(TxnLog.snapshotFull(spark, t).forall(_._2.cl.isEmpty))
    val r = TxnLog.clusterIncremental(spark, t, Seq(col("k")))
    assert(r.removed > 0, "unmarked files must rewrite on bare OPTIMIZE")
  }

  test("flag on but the frame lacks a cluster key: write proceeds " +
       "unshaped and unmarked") {
    import spark.implicits._
    val t = freshDir("nokey")
    // Table clustered on k; append a DV-like frame without k is not
    // possible through append (schema enforcement), so exercise the
    // guard through a table whose key the frame CARRIES but the flag
    // path must skip: an unclustered table with the flag on.
    TxnLog.create(spark, t, Seq((1L, "a")).toDF("k", "s"))
    spark.conf.set(TxnLog.ClusterOnWriteConf, "true")
    try TxnLog.append(spark, t, Seq((2L, "b")).toDF("k", "s"))
    finally spark.conf.unset(TxnLog.ClusterOnWriteConf)
    assert(TxnLog.snapshotFull(spark, t).forall(_._2.cl.isEmpty),
      "no CLUSTER BY declaration → no markers, flag or not")
  }

  test("cluster-on-write takes precedence over the optimize-write " +
       "rebalance hint: files stay range-clustered AND marked") {
    val t = clusteredTable("prec")
    spark.conf.set("spark.graft.write.rebalance", "true")
    try withClusterWrite { TxnLog.append(spark, t, batch(4000)) }
    finally spark.conf.unset("spark.graft.write.rebalance")
    val spans = TxnLog.snapshotWithStats(spark, t).flatMap(_._2)
      .flatMap(_.cols.get("k")).map(cs => cs.max - cs.min).filter(_ > 1)
    assert(spans.nonEmpty && spans.forall(_ < 3000),
      s"rebalance must not scatter a write-clustered batch, spans $spans")
    assert(TxnLog.snapshotFull(spark, t).exists(_._2.cl.isDefined))
  }

  test("maintenance rewrites also dodge the rebalance hint: a " +
       "clustered OPTIMIZE under write.rebalance stays clustered") {
    val t = clusteredTable("maint")
    TxnLog.append(spark, t, batch(4000))
    spark.conf.set("spark.graft.write.rebalance", "true")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      "1024")
    try TxnLog.compact(spark, t, targetFiles = 4, Seq(col("k")))
    finally {
      spark.conf.unset("spark.graft.write.rebalance")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    }
    val spans = TxnLog.snapshotWithStats(spark, t).flatMap(_._2)
      .flatMap(_.cols.get("k")).map(cs => cs.max - cs.min).filter(_ > 1)
    assert(spans.nonEmpty && spans.forall(_ < 3000),
      s"rebalance hint must not scatter a clustered rewrite, spans $spans")
    assert(TxnLog.snapshotFull(spark, t).forall(_._2.cl.isDefined),
      "every post-OPTIMIZE live file must carry the marker")
  }

  test("COPY INTO with the flag on stamps the ingested files") {
    import spark.implicits._
    val t = clusteredTable("copy")
    val land = freshDir("copy_land")
    batch(2000).coalesce(1).write.parquet(s"$land/u1")
    withClusterWrite { assert(TxnLog.copyInto(spark, t, land).loaded === 1L) }
    assert(TxnLog.snapshotFull(spark, t).count(_._2.cl.isDefined) >= 1,
      "COPY INTO must stamp clustered-at like append")
    assert(TxnLog.read(spark, t).count() === 2001L)
  }
}
