package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: measured HLL++ estimate-vs-exact error for the
  * q_hll_distinct sketch at a given scale directory.
  *
  * `runMain graft.HllError [sfDir]` — numbers quoted in PLANS.md. The
  * oracle gate pins |est/exact − 1| ≤ 5·rsd at sf0.01, where
  * per-source vocabulary is small enough that HLL++ runs in its exact
  * (sparse) regime; this CLI records the error at cardinalities where
  * the sketch actually approximates, so the rsd claim is a measurement
  * rather than an extrapolation. Exact side is the same
  * distinct→count two-level aggregation the query uses (no
  * mixed-distinct Expand).
  */
object HllError {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rsd = 0.02
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The query's own token stream: per-source word vocabulary, plus an
    // ALL-sources union row for one decade-larger cardinality from the
    // same data.
    val toks = graft.queries.CorpusQueries.tokenRows(spark, sfDir)
      .filter(length(col("word")) > 0)
      .select(col("source"), col("word"))
    def table(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val exact = df.distinct().groupBy("source").agg(count(lit(1)).as("exact"))
      val approx = df.groupBy("source")
        .agg(approx_count_distinct(col("word"), rsd).as("est"))
      val rows = exact.join(approx, "source")
        .select(col("source"), col("exact"), col("est"),
          round(abs(col("est").cast("double") / col("exact") - 1.0), 6).as("rel_err"))
        .orderBy("source").collect()
      println(s"-- $label (rsd=$rsd, 5-sigma gate=${5 * rsd})")
      rows.foreach(r => println(f"${r.getString(0)}%-14s exact=${r.getLong(1)}%8d " +
        f"est=${r.getLong(2)}%8d rel_err=${r.getDouble(3)}%.4f"))
      val worst = rows.map(_.getDouble(3)).max
      println(f"worst rel_err = $worst%.4f (${if (worst <= 5 * rsd) "within" else "OUTSIDE"} gate)")
    }
    table(toks, s"per-source vocabulary @ $sfDir")
    table(toks.withColumn("source", lit("ALL")), s"union vocabulary @ $sfDir")
    // Doc-id cardinality: a genuinely large-cardinality column (unique
    // per row), the regime where HLL++ leaves sparse mode.
    table(graft.queries.CorpusQueries.tokenRows(spark, sfDir)
      .select(lit("doc_ids").as("source"), col("doc_id").cast("string").as("word")),
      s"doc_id cardinality @ $sfDir")
    spark.stop()
  }
}
