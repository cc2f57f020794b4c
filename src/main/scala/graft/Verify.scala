package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Kill-safe by construction (the lesson of round 6's bench rc 124,
  * applied to the HIGHER-stakes artifact — a dead bench loses a perf
  * number, a dead verify would zero the round's correctness):
  *
  *  - `oracle_sql.json` is written FIRST, before any query runs. A kill
  *    at any later point leaves a parseable gate: every completed
  *    query's parquet is present and comparable, the missing ones read
  *    as failures instead of the whole round reading as nothing.
  *  - Queries run slowest-last is NOT assumed: each query's dump is
  *    independent, so partial progress is monotone.
  *  - `SPARK_GRAFT_VERIFY_BUDGET_SEC` (optional) stops cleanly before
  *    a host-level timeout would kill the JVM mid-write: once the
  *    budget is exceeded, remaining queries are skipped with a logged
  *    list rather than being cut off wherever the kill lands.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession.builder IS the user-session config (extensions, UTC,
    // AQE, parquet read semantics, catalog) — the gate checks the
    // engine exactly as a user session runs it, and three hand-copied
    // config blocks (Verify/Bench/GraftSession) had already drifted
    // once (Bench missing UTC) before this was unified.
    val spark = GraftSession.builder("graft-verify")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The DUMPS must stay INT96: the driver's pyarrow-vs-DuckDB compare
    // reads TIMESTAMP_MICROS parquet as tz-AWARE and the oracle side as
    // naive — 7 timestamp queries would hash-mismatch on tzinfo alone.
    // GraftSession's MICROS default (footer-stats-capable) stays for
    // real sessions; only this gate's result encoding pins the legacy
    // form the comparator has always read.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    new java.io.File(outDir).mkdirs()
    // Local-iteration subset (mirrors SPARK_GRAFT_BENCH_ONLY): dump only
    // the named queries. The driver's gate never sets it, so the full
    // surface always runs there.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.view.filterKeys(ks).toMap)

    val json = only.fold(SparkEntry.oracleSql)(ks =>
        SparkEntry.oracleSql.view.filterKeys(ks).toMap)
      .map { case (k, v) => s"${JsonUtil.quote(k)}: ${JsonUtil.quote(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val budgetSec = sys.env.get("SPARK_GRAFT_VERIFY_BUDGET_SEC").map(_.toLong)
    val t0 = System.nanoTime()
    def elapsedSec: Long = (System.nanoTime() - t0) / 1000000000L
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      if (budgetSec.exists(elapsedSec >= _)) skipped += name
      else {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
        finally graft.queries.StagedCache.releaseAll()
      }
    }
    if (skipped.nonEmpty)
      System.err.println(s"[verify] budget exceeded after ${elapsedSec}s; " +
        s"skipped ${skipped.size}: ${skipped.sorted.mkString(",")}")
    spark.stop()
  }
}
