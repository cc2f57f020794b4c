package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Diagnostic: join-key skew profile and salt recommendation.
  *
  * `runMain graft.SkewAdvise [sfDir] [table] [key] [capacity]` — the
  * pre-flight a 100 TB join runs before choosing a strategy: ONE
  * bounded-state scan (SpaceSaving heavy hitters + total count in the
  * same aggregate) answers three questions the planner can't from
  * parquet stats alone:
  *
  *  - the hottest key's SHARE of all rows (its partition after a hash
  *    shuffle receives at least this fraction — AQE can split it only
  *    after materializing it);
  *  - the skew factor = share × shuffle partitions (how many times an
  *    average partition the hottest key occupies — > 1 means the
  *    shuffle is imbalanced no matter how partitions are drawn);
  *  - the salt count that rebalances it (ceil of the skew factor —
  *    what [[graft.operators.SkewGuard]] takes as its cap argument,
  *    and the operators' salted variants take as nsalts).
  *
  * SpaceSaving's overestimate bound (est ≤ true + err, err reported)
  * makes the share an HONEST upper bound: the advice can over-salt
  * slightly, never under-salt.
  */
object SkewAdvise {

  /** Library form of the CLI's recommendation, so the advice is
    * EXECUTABLE instead of advisory: ONE bounded-state scan (SpaceSaving
    * top-1 + total count in the same aggregate) returns the salt count
    * that rebalances the hottest key — what
    * [[graft.operators.InvertedIndex.saltedPostingsAdvised]] feeds
    * straight into its two-phase aggregation. SpaceSaving's est is an
    * over-estimate bound, so the advice can over-salt, never under-salt;
    * empty input (or an all-null key) advises 1 (plain hash shuffle).
    * Driver-side cost: a 1-row collect of ≤ capacity entries, constant
    * at any scale. */
  def recommend(df: org.apache.spark.sql.DataFrame,
      key: org.apache.spark.sql.Column, capacity: Int = 64): Int = {
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val r = df.agg(
        count(key).as("n_rows"),
        graft.functions.SpaceSavingAgg(key.cast("string"), capacity, 1).as("hh"))
      .select(col("n_rows"),
        element_at(col("hh"), 1).getField("est").as("top_est"))
      .collect().head
    val n = r.getLong(0)
    if (n == 0 || r.isNullAt(1)) 1
    else math.max(1, math.ceil(r.getLong(1).toDouble / n * nPart).toInt)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val table = args.lift(1).getOrElse("lineitem")
    val key = args.lift(2).getOrElse("l_orderkey")
    val capacity = args.lift(3).map(a => a.toIntOption.getOrElse {
      System.err.println(
        "usage: SkewAdvise [sfDir] [table] [key] [capacity:int]")
      sys.exit(1)
    }).getOrElse(64)
    val spark = GraftSession.getOrCreate("graft-skew-advise")
    spark.sparkContext.setLogLevel("WARN")
    val nPart = spark.sessionState.conf.numShufflePartitions

    val df = Tables(spark, sfDir, table)
    val one = df.agg(
      count(lit(1)).as("n_rows"),
      graft.functions.SpaceSavingAgg(col(key).cast("string"), capacity, 10)
        .as("hh"))
    val row = one.select(col("n_rows"), posexplode(col("hh")).as(Seq("i", "e")))
      .select(col("n_rows"), (col("i") + 1).cast("long").as("rnk"),
        col("e.term").as("term"), col("e.est").as("est"), col("e.err").as("err"))
      .orderBy("rnk")
      .collect()

    if (row.isEmpty) {
      // scalastyle:off println
      println(s"table=$table key=$key rows=0 — empty table or all-null " +
        "key; no advice")
      // scalastyle:on println
      spark.stop()
      return
    }
    val nRows = row.head.getAs[Long]("n_rows")
    // scalastyle:off println
    println(s"table=$table key=$key rows=$nRows shufflePartitions=$nPart")
    row.foreach { r =>
      val est = r.getAs[Long]("est")
      val share = est.toDouble / nRows
      val skew = share * nPart
      println(f"  #${r.getAs[Long]("rnk")}%2d key=${r.getAs[String]("term")}%-12s " +
        f"est=$est%8d err=${r.getAs[Long]("err")}%6d share=$share%.4f " +
        f"skewFactor=$skew%.2f")
    }
    val maxShare = row.map(r => r.getAs[Long]("est")).max.toDouble / nRows
    val salts = math.max(1, math.ceil(maxShare * nPart).toInt)
    println(s"recommended salts (SkewGuard cap / salted-op nsalts): $salts" +
      (if (salts == 1) " — no hot key dominates; plain hash shuffle balances" else ""))
    // scalastyle:on println
    spark.stop()
  }
}
