package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic N× inflation of a driver testdata directory — the
  * measured-scaling-curve harness (`runMain graft.Inflate <in> <out>
  * [factor]`): every 100 TB claim in PLANS.md is a plan-audit property;
  * benching the same queries at sf0.1 and a 10× inflation converts the
  * audits into measured scaling exponents and catches any
  * accidentally-super-linear candidate generator.
  *
  * Inflation = union of `factor` key-offset replicas (replica 0 is the
  * original bytes), seed-free and deterministic. Shape invariants, each
  * chosen so the DATA's growth stays linear and any super-linearity in
  * a measurement is therefore the ENGINE's:
  *
  *  - **Keys offset by replica stride** (max+1 per table), and foreign
  *    keys offset in lockstep (l_orderkey with o_orderkey, o_custkey
  *    with c_custkey, …), so join fan-outs and per-key group sizes are
  *    IDENTICAL in every replica — a group-by scales in group count,
  *    never in group size.
  *  - **Dimension tables (nation, region) stay fixed** — as in TPC-H
  *    scaling; broadcast sides must stay broadcast at every sf.
  *  - **Document text is re-tokenized per replica** with
  *    position-tagged markers before every 2nd word: every 3-token
  *    window of replica k contains a marker no other replica has
  *    (cross-replica dup families never form), and markers are
  *    position-distinct so within-replica shingle selectivity matches
  *    the base corpus — planted dup CLUSTERS replicate per-replica and
  *    dup density (the quadratic hazard) stays linear in factor.
  *  - **Embeddings get a per-replica deterministic sign flip** (a
  *    diagonal ±1 orthogonal transform): within-replica geometry is
  *    exactly the base corpus's, cross-replica cosines scatter to ~0 —
  *    near-dup/ANN structure replicates per-replica instead of every
  *    replica being a near-dup of its base. user_ids offset so
  *    gap-fill's per-user spine count scales in users, never in
  *    per-user range.
  */
object Inflate {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Inflate <inDir> <outDir> [factor]")
    val (in, out) = (args(0), args(1))
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, in, out, factor)
    spark.stop()
  }

  /** The inflation itself, session-supplied — shared by this main and
    * the `graft.Main inflate` CLI subcommand. */
  def run(spark: SparkSession, in: String, out: String, factor: Int): Unit = {
    def read(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    def replicate(df: DataFrame)(xform: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => xform(df, k)).reduce(_ unionAll _)

    // Marker-interleaved text: a POSITION-TAGGED replica marker before
    // every 2nd word ("r<k>p<i>"), so (a) every 3-token window contains
    // a marker → no shingle of replica k collides with replica j ≠ k
    // (cross-replica dup families never form), and (b) markers are
    // distinct WITHIN a replica → shingle keys stay as selective as the
    // base corpus (a first cut used one uniform marker per replica; its
    // shingles collapsed to 2 effective tokens and candidate-join
    // groups grew super-linearly — a data artifact masquerading as an
    // engine exponent).
    def remix(text: org.apache.spark.sql.Column, k: Int) = {
      val toks = split(text, "\\s+")
      array_join(flatten(transform(toks, (t, i) =>
        when(i % 2 === 0,
          // Integer division: the bare `/` is DOUBLE division, whose
          // string form "3.0" the tokenizer would split into a marker
          // token plus a universal "0" token — recreating exactly the
          // coarse-key explosion the markers exist to prevent.
          array(concat(lit(s"r${k}p"), (i / 2).cast("int").cast("string")), t))
          .otherwise(array(t)))), " ")
    }

    val docs = read("documents")
    val docStride = stride(docs, "doc_id")
    val orders = read("orders")
    val orderStride = stride(orders, "o_orderkey")
    val custStride = stride(read("customer"), "c_custkey")
    val partStride = stride(read("part"), "p_partkey")
    val suppStride = stride(read("supplier"), "s_suppkey")
    val events = read("events")
    val userStride = stride(events, "user_id")
    val eventStride = stride(events, "event_id")
    val emb = read("embeddings")
    val vecStride = stride(emb, "vec_id")

    val tables: Map[String, DataFrame] = Map(
      "documents" -> replicate(docs) { (df, k) =>
        if (k == 0) df
        else df.select(
          (col("doc_id") + k * docStride).as("doc_id"),
          remix(col("text"), k).as("text"),
          col("lang"), col("source"),
          length(remix(col("text"), k)).cast("long").as("n_chars"))
      },
      "embeddings" -> replicate(emb) { (df, k) =>
        // Per-replica deterministic SIGN FLIP (a diagonal ±1 orthogonal
        // transform): within-replica geometry is EXACTLY the base
        // corpus's (distances and cosines preserved — isometry), while
        // cross-replica cosines scatter to ~0, so replicas are not
        // near-duplicates of each other and near-dup/ANN output grows
        // linearly in factor. (A first cut used small additive jitter;
        // its replicas were all near-dups of the base vector and the
        // pair count grew quadratically — a data artifact, not an
        // engine one.)
        if (k == 0) df
        else df.select(
          (col("vec_id") + k * vecStride).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            when(pmod(hash(lit(k), i), lit(2)) === 0, x).otherwise(-x)
              .cast("float")).as("embedding"),
          col("label"))
      },
      "events" -> replicate(events) { (df, k) =>
        if (k == 0) df
        else df.select(
          (col("event_id") + k * eventStride).as("event_id"), col("ts"),
          (col("user_id") + k * userStride).as("user_id"),
          col("event_type"), col("value"), col("props"))
      },
      "lineitem" -> replicate(read("lineitem")) { (df, k) =>
        if (k == 0) df
        else df
          .withColumn("l_orderkey", col("l_orderkey") + k * orderStride)
          .withColumn("l_partkey", col("l_partkey") + k * partStride)
          .withColumn("l_suppkey", col("l_suppkey") + k * suppStride)
      },
      "orders" -> replicate(orders) { (df, k) =>
        if (k == 0) df
        else df
          .withColumn("o_orderkey", col("o_orderkey") + k * orderStride)
          .withColumn("o_custkey", col("o_custkey") + k * custStride)
      },
      "customer" -> replicate(read("customer")) { (df, k) =>
        if (k == 0) df
        else df.withColumn("c_custkey", col("c_custkey") + k * custStride)
      },
      "part" -> replicate(read("part")) { (df, k) =>
        if (k == 0) df
        else df.withColumn("p_partkey", col("p_partkey") + k * partStride)
      },
      "supplier" -> replicate(read("supplier")) { (df, k) =>
        if (k == 0) df
        else df.withColumn("s_suppkey", col("s_suppkey") + k * suppStride)
      },
      "nation" -> read("nation"),
      "region" -> read("region"))

    tables.foreach { case (t, df) =>
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[inflate] $t -> $out/$t.parquet")
    }
  }
}
