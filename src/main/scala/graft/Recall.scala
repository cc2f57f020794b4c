package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: recall@3 of each ANN query against the exact
  * `q_ann_brute` ground truth on the probe subset (vec_id ≡ 0 mod 25).
  *
  * `runMain graft.Recall [sfDir]` — numbers quoted in PLANS.md. The
  * only driver-side collect is of top-k outputs (3 rows per probe), a
  * few KB; the searches themselves run distributed.
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pairs(name: String): Set[(Long, Long)] =
      try SparkEntry.queries(name)(spark, sfDir)
        // Restrict to the probe subset BEFORE collecting: the
        // self-search queries emit top-k for EVERY vector, and an
        // unfiltered collect would be O(corpus) driver memory.
        .filter("probe_id % 25 = 0")
        .selectExpr("cast(probe_id as long)", "cast(cand_id as long)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally graft.queries.StagedCache.releaseAll()

    val truth = pairs("q_ann_brute")
    val probes = truth.map(_._1)
    println(s"sf=$sfDir probes=${probes.size} truth pairs=${truth.size}")

    // Round-8 IVF headroom sweep (verdict #7): quantizer training depth
    // (Lloyd iterations) × probe fan-out (nprobe), against the same
    // exact ground truth. The shipped q_ann_ivf operating point is
    // (ivfNProbe, ivfLloydIters); the sweep quantifies what nprobe or
    // deeper training buys BEFORE reranking, so the knee is a measured
    // choice, not a guess. Skipped via SPARK_GRAFT_RECALL_SWEEP=0.
    if (sys.env.getOrElse("SPARK_GRAFT_RECALL_SWEEP", "1") != "0") {
      for (iters <- Seq(1, 3, 6); np <- Seq(2, 4, 8)) {
        val got =
          try graft.queries.VectorQueries.ivfTopK(spark, sfDir, np, iters)
            .filter("probe_id % 25 = 0")
            .selectExpr("cast(probe_id as long)", "cast(cand_id as long)")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          finally graft.queries.StagedCache.releaseAll()
        val recall = truth.count(got) / truth.size.toDouble
        println(f"ivf_iters${iters}_nprobe$np recall@3 = $recall%.3f  " +
          f"(pairs kept on probe set: ${got.size})")
      }
    }
    for (name <- Seq("q_ann_lsh", "q_ann_lsh_mp_self", "q_ann_lsh_multiprobe",
      "q_ann_ivf", "q_ann_quantized", "q_ann_pq", "q_ann_ivfpq")) {
      val got = pairs(name).filter(p => probes(p._1))
      val recall = truth.count(got) / truth.size.toDouble
      println(f"$name%-24s recall@3 = $recall%.3f  (pairs kept on probe set: ${got.size})")
    }

    // Baseline for q_ann_ivf's trained quantizer: the round-3 stand-in
    // (seed centroids = first 16 vectors, no Lloyd step, nprobe=1).
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import graft.functions.VectorFunctions
      val e = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"),
          VectorFunctions.l2Norm(col("embedding")).as("nrm"))
      val cent = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val assign = e.crossJoin(broadcast(cent))
        .withColumn("dd", round(VectorFunctions.dist2(col("embedding"), col("cv")), 6))
        .withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy(col("dd"), col("cid"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cid").as("cell"))
      val p = assign.filter(col("vec_id") % 25 === 0)
        .select(col("cell"), col("vec_id").as("probe_id"),
          col("embedding").as("pv"), col("nrm").as("pnrm"))
      val c = assign.select(col("cell"), col("vec_id").as("cand_id"),
        col("embedding").as("cv2"), col("nrm").as("cnrm"))
      val got = p.join(c, "cell")
        .filter(col("probe_id") =!= col("cand_id"))
        .select(col("probe_id"), col("cand_id"),
          round(VectorFunctions.dot(col("pv"), col("cv2"))
            / (col("pnrm") * col("cnrm")), 6).as("cos_sim"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("probe_id").orderBy(col("cos_sim").desc, col("cand_id"))))
        .filter(col("rnk") <= 3)
        .selectExpr("cast(probe_id as long)", "cast(cand_id as long)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = truth.count(got) / truth.size.toDouble
      println(f"ivf_untrained_nprobe1    recall@3 = $recall%.3f  (pairs kept on probe set: ${got.size})")
    }
    spark.stop()
  }
}
