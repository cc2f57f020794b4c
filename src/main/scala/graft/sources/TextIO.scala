package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Line-text source and `key \t value` text sink — the reference's only
  * I/O surface (SURVEY §2.1 S1/S4/S5):
  *
  *  - `TextInputFormat` → `spark.read.text` (one `value: string` column;
  *    Spark drops the byte offsets the reference never uses as data —
  *    `TraceWordCountJob.java:92,102`);
  *  - `TextOutputFormat` (`key TAB value` lines) → tab-joined projection
  *    written with `.text` (`TraceWordCountJob.java:93,103`);
  *  - job-fails-if-output-exists ≙ `SaveMode.ErrorIfExists`; the run
  *    scripts' `hdfs dfs -rm -r` pre-clean ≙ `SaveMode.Overwrite`
  *    (`trace-wordcount-job/run.sh:60-61`).
  *
  * Scale notes: the text scan splits by `spark.sql.files.maxPartitionBytes`
  * (≙ S2's blocksize/min-split tuning — set it per job instead of
  * hand-placing splits) and packs small files automatically (≙ S3's
  * latent CombineTextInputFormat). The sink writes one file per
  * partition in parallel — never coalesce(1) a large result.
  */
object TextIO {

  /** S1: read a directory (or file, or glob) of line-text. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** S2 analog: read with an explicit target split size. Split sizing
    * is a session conf, not a per-read option, so it is set for the
    * duration of PLANNING this read and restored after — the scan
    * captures the value when the DataFrame is constructed. (≙ the
    * reference's `dfs.blocksize`/`minsize` tuning,
    * `TraceInsertIndexJob.java:58-63`.) */
  def readLines(spark: SparkSession, path: String, maxSplitBytes: Long): DataFrame = {
    val key = "spark.sql.files.maxPartitionBytes"
    val prev = spark.conf.get(key)
    spark.conf.set(key, maxSplitBytes.toString)
    try {
      // Physical planning re-reads the conf per action, so pin the split
      // decision by materializing the scan's RDD lineage now and
      // re-wrapping it (line text has no pushdown to lose).
      val rdd = spark.read.text(path).rdd
      spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
    } finally spark.conf.set(key, prev)
  }

  /** S4/S5: write all columns as `c1 \t c2 \t ...` lines.
    * `overwrite = false` preserves the reference's fail-if-exists
    * contract. NULLs render as the empty string (the reference never
    * emits nulls; Hadoop TextOutputFormat would print "null"). */
  def writeTsv(df: DataFrame, path: String, overwrite: Boolean = false): Unit =
    df.select(concat_ws("\t",
        df.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
        .as("value"))
      .write
      .mode(if (overwrite) SaveMode.Overwrite else SaveMode.ErrorIfExists)
      .text(path)
}
