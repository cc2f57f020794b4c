package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-table maintenance operators: small-file compaction, partition
  * statistics collection, and stats-driven scan pruning — the jobs a
  * 100 TB training-data lake runs continuously between queries.
  *
  * Why these are first-class engine ops and not scripts:
  *
  *  - **Small files are the dominant operational failure of streaming
  *    ingest at scale**: a sink appending a file per micro-batch per
  *    partition turns a 100 TB table into hundreds of millions of
  *    KB-sized objects, and every later scan pays open/seek/footer cost
  *    per file. Compaction rewrites partitions into target-sized files.
  *  - **Partition/file statistics are what lets a planner skip data it
  *    can prove irrelevant**: parquet carries row-group min/max, but a
  *    table-level stats summary (one row per partition) lets pruning
  *    happen at PLAN time from metadata — no file of a skipped
  *    partition is ever opened. This is the published Delta/Iceberg
  *    data-skipping design (Armbrust et al., "Delta Lake: High-
  *    Performance ACID Table Storage", VLDB 2020, §4.2) re-expressed
  *    with plain parquet + a sidecar stats table.
  *
  * Compaction is deliberately Spark-native: a REBALANCE hint keyed on
  * the partition column plus AQE's advisory partition size. AQE then
  * plans the rewrite from the MEASURED shuffle sizes — oversized
  * partitions split, undersized neighbors coalesce — which is the same
  * decision a hand-rolled bin-packer makes, made at runtime from real
  * sizes instead of planner guesses, and it holds at any scale because
  * no per-partition state ever reaches the driver.
  */
object LakeMaintenance {

  /** One rewrite pass's before/after file accounting. */
  final case class CompactReport(
      filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long)

  private val Advisory = "spark.sql.adaptive.advisoryPartitionSizeInBytes"

  /** Rewrite the partitioned parquet table at `in` into `out` with
    * ~`targetBytes`-sized tasks per partition-column group. The data is
    * byte-identical (same rows, same partition layout); only the file
    * count/size distribution changes. The advisory size governs AQE's
    * split/coalesce of the rebalance shuffle — parquet encoding +
    * compression means on-disk files land below the advisory; the
    * contract is "few, task-sized files", not an exact byte count.
    *
    * `clusterBy` turns the rewrite into the OPTIMIZE … ZORDER BY
    * shape: pass [[graft.functions.ZOrder.zvalue]] of two scaled
    * dimensions and every compacted file gets bounded min/max spans on
    * BOTH, so row-group stats prune scans along either axis. A
    * clustered rewrite MUST range-partition on (partition, cluster
    * key) — an AQE rebalance cannot serve here, because it splits
    * oversized shuffle partitions by MAPPER ranges, so each output
    * task would hold an arbitrary row subset spanning the full cluster
    * domain and a local sort could never bound a file's span. The
    * task count comes from the listed input bytes over `targetBytes`
    * (a driver-side file listing — metadata cost, what any planner
    * pays); still one shuffle total, same as the plain path.
    */
  def compact(spark: SparkSession, in: String, out: String,
              partitionCol: String, targetBytes: Long,
              clusterBy: Seq[Column] = Nil): CompactReport = {
    val before = dataFiles(spark, in)
    val prev = spark.conf.getOption(Advisory)
    spark.conf.set(Advisory, targetBytes.toString)
    try {
      val table = spark.read.parquet(in)
      val compacted =
        if (clusterBy.isEmpty) table.hint("rebalance", partitionCol)
        else {
          val keys = col(partitionCol) +: clusterBy
          val nTasks = math.max(1L,
            (before.map(_._2).sum + targetBytes - 1) / targetBytes).toInt
          table.repartitionByRange(nTasks, keys: _*)
            .sortWithinPartitions(keys: _*)
        }
      compacted.write.mode("overwrite").partitionBy(partitionCol).parquet(out)
    } finally prev match {
      case Some(v) => spark.conf.set(Advisory, v)
      case None    => spark.conf.unset(Advisory)
    }
    val after = dataFiles(spark, out)
    CompactReport(before.size, before.map(_._2).sum,
      after.size, after.map(_._2).sum)
  }

  /** Per-partition stats for `valueCol`: one row per `partitionCol`
    * value with row count and min/max — the skipping index. A pure
    * map-side-combined aggregation: cost is one scan, output is
    * partition-count-sized (metadata scale even on a 100 TB table). */
  def partitionStats(table: DataFrame, partitionCol: String,
                     valueCol: String): DataFrame =
    table.groupBy(partitionCol).agg(
      count(lit(1)).as("row_cnt"),
      min(valueCol).as("min_v"),
      max(valueCol).as("max_v"))

  /** ANALYZE: compute [[partitionStats]] for the parquet table at
    * `tableDir` and persist them as the `_stats` sidecar dataset inside
    * it. The leading underscore keeps every table scan from reading the
    * sidecar (parquet data-source path filtering skips `_`/`.` names),
    * exactly as `_delta_log` rides inside a Delta table. */
  def collectStats(spark: SparkSession, tableDir: String,
                   partitionCol: String, valueCol: String): Unit =
    partitionStats(spark.read.parquet(tableDir), partitionCol, valueCol)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$tableDir/_stats")

  /** Append `delta` to the table AND fold its stats into the `_stats`
    * sidecar WITHOUT rescanning the table — the incremental-ANALYZE
    * path. count/min/max are algebraically mergeable under append
    * (count adds, min/max widen), so the sidecar update costs one scan
    * of the DELTA plus a partition-count-sized merge; a 100 TB table's
    * stats stay current at ingest cost, not table cost. Append-only by
    * contract: deletes/updates can shrink a partition's true min/max
    * below what a widen-only merge records, so a compacting or deleting
    * rewrite must re-run [[collectStats]] (stats stay SOUND for pruning
    * either way — they only ever over-admit, never exclude a match).
    */
  def appendWithStats(spark: SparkSession, tableDir: String, delta: DataFrame,
                      partitionCol: String, valueCol: String): Unit = {
    delta.write.mode("append").partitionBy(partitionCol).parquet(tableDir)
    val statsPath = s"$tableDir/_stats"
    val merged = spark.read.parquet(statsPath)
      .unionByName(partitionStats(delta, partitionCol, valueCol))
      .groupBy(partitionCol).agg(
        sum("row_cnt").as("row_cnt"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"))
      // The merge reads the path it is about to overwrite: materialize
      // the (partition-count-sized) result before the write clobbers
      // its own input.
      .localCheckpoint(true)
    merged.coalesce(1).write.mode("overwrite").parquet(statsPath)
    merged.unpersist(true)
  }

  /** A scan of `tableDir` answering `valueCol ∈ [lo, hi]` that consults
    * the `_stats` sidecar FIRST and enumerates only partitions whose
    * [min,max] intersects the range — the surviving values arrive as a
    * partition-column IN-filter, so Spark prunes the skipped partitions'
    * directories from the file listing before any data file opens.
    *
    * The stats collect is a deliberate, bounded driver step: the
    * sidecar has one row per partition (thousands, not billions), and
    * resolving "which partitions can match" at plan time from metadata
    * is the entire point of keeping stats — the same shape as Delta's
    * log-driven file skipping. The data-side predicate stays too: stats
    * prove absence, not presence, so in-range partitions still filter
    * row-by-row (and parquet row-group min/max prunes within files).
    */
  def prunedScan(spark: SparkSession, tableDir: String, partitionCol: String,
                 valueCol: String, lo: Long, hi: Long): DataFrame = {
    val qualifying = spark.read.parquet(s"$tableDir/_stats")
      .filter(col("max_v") >= lo && col("min_v") <= hi)
      .select(partitionCol)
      .collect().map(_.get(0))
    spark.read.parquet(tableDir)
      .filter(col(partitionCol).isin(qualifying.toIndexedSeq: _*) &&
        col(valueCol) >= lo && col(valueCol) <= hi)
  }

  /** Recursive data-file listing of a table directory, skipping
    * `_`/`.`-prefixed sidecars and markers (`_SUCCESS`, `_stats`). */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      val inSidecar = f.getPath.toString.contains("/_")
      if (!name.startsWith("_") && !name.startsWith(".") && !inSidecar)
        out += ((f.getPath.toString, f.getLen))
    }
    out.toSeq
  }
}
