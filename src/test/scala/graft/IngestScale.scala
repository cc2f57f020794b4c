package graft

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** Measured evidence for the round-16 INGESTION band at corpus scale
  * (`sbt "Test/runMain graft.IngestScale <sfDir>"`, typically a ×1000
  * Inflate corpus): the claims COPY INTO and cluster-on-write make,
  * as numbers —
  *
  *  1. COPY INTO's cost is the NEW files (first load = the data; the
  *     idempotent re-run = a ledger lookup, flat in corpus size);
  *  2. an incremental landing (one more upload) costs the upload,
  *     never the table;
  *  3. cluster-on-write's extra exchange at write time buys a bare
  *     OPTIMIZE that rewrites NOTHING — vs the flag-off table where
  *     the same OPTIMIZE re-clusters the whole corpus.
  *
  * Prints one JSON line for PLANS.md. */
object IngestScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("graft-ingestscale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = s"${sys.props("java.io.tmpdir")}/graft_ingestscale_${System.nanoTime()}"

    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
    val rows = docs.count()

    def timed(body: => Any): (Double, Any) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // ---- landing zone: 16 "uploads" of the corpus, one subdir each.
    val land = s"$root/landing"
    docs.withColumn("u", pmod(col("doc_id"), lit(16)))
      .write.partitionBy("u").parquet(land)
    // The hive layout carries u in paths, not files — re-land without
    // the helper column so uploads are plain full-schema parquet.
    val landFlat = s"$root/landing_flat"
    (0 until 16).foreach(i =>
      spark.read.parquet(s"$land/u=$i").write.parquet(s"$landFlat/u$i"))

    val tbl = s"$root/copied"
    TxnLog.create(spark, tbl, docs.limit(0))
    val (firstS, firstR) = timed(TxnLog.copyInto(spark, tbl, landFlat))
    val loaded = firstR.asInstanceOf[TxnLog.CopyResult].loaded
    val (rerunS, rerunR) = timed(TxnLog.copyInto(spark, tbl, landFlat))
    require(rerunR.asInstanceOf[TxnLog.CopyResult].loaded == 0L)
    // one more upload lands; the incremental copy costs the upload.
    spark.read.parquet(s"$land/u=0").write.parquet(s"$landFlat/u16")
    val (incrS, incrR) = timed(TxnLog.copyInto(spark, tbl, landFlat))
    require(incrR.asInstanceOf[TxnLog.CopyResult].loaded >= 1L)

    // ---- cluster-on-write vs write-then-cluster.
    def clusteredCreate(path: String): Unit = {
      val df = docs.limit(0)
      val schema = org.apache.spark.sql.types.StructType(
        df.schema.fields.map {
          case f if f.name == "n_chars" => f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .putLong(TxnLog.ClusterColKey, 0L).build())
          case f => f
        })
      TxnLog.create(spark, path,
        spark.createDataFrame(df.rdd, schema))
    }
    val cow = s"$root/cow"
    clusteredCreate(cow)
    spark.conf.set(TxnLog.ClusterOnWriteConf, "true")
    val (cowAppendS, _) =
      try timed(TxnLog.append(spark, cow, docs))
      finally spark.conf.unset(TxnLog.ClusterOnWriteConf)
    val (cowOptS, cowOptR) =
      timed(TxnLog.clusterIncremental(spark, cow, Seq(col("n_chars"))))
    val cowRewrote = cowOptR.asInstanceOf[TxnLog.CommitResult].removed

    val plain = s"$root/plain"
    clusteredCreate(plain)
    val (plainAppendS, _) = timed(TxnLog.append(spark, plain, docs))
    val (plainOptS, plainOptR) =
      timed(TxnLog.clusterIncremental(spark, plain, Seq(col("n_chars"))))
    val plainRewrote = plainOptR.asInstanceOf[TxnLog.CommitResult].removed

    def f(d: Double) = f"$d%.3f"
    println(s"""{"metric":"ingest_scale","sf_dir":"$sfDir","rows":$rows,""" +
      s""""copy_first_sec":${f(firstS)},"copy_first_files":$loaded,""" +
      s""""copy_rerun_sec":${f(rerunS)},""" +
      s""""copy_incr_sec":${f(incrS)},""" +
      s""""cow_append_sec":${f(cowAppendS)},""" +
      s""""cow_optimize_sec":${f(cowOptS)},"cow_rewrote":$cowRewrote,""" +
      s""""plain_append_sec":${f(plainAppendS)},""" +
      s""""plain_optimize_sec":${f(plainOptS)},""" +
      s""""plain_rewrote":$plainRewrote}""")

    val fsp = new org.apache.hadoop.fs.Path(root)
    fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(fsp, true)
  }
}
