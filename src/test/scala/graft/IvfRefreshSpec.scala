package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnIndexStore
import graft.sources.TxnLog

/** Incremental index lifecycle ([[AnnIndexStore.ensureIncremental]]):
  * build-once, refresh-per-advance, retrain-on-rewrite. The IVF query
  * semantics are q_ann_ivf_refresh's oracle; these pin the chain
  * mechanics the oracle cannot see — which builder ran, how many
  * generations exist, and that the quantizer never silently retrains
  * on a pure append. */
class IvfRefreshSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_ivfr_${spark.sparkContext.applicationId}_$tag"
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  private def touch(dir: String, name: String): Unit = {
    val p = new Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("x".getBytes("UTF-8")); out.close()
  }

  test("ensureIncremental: full build once, delta per append, cached " +
       "re-resolution, retrain on delete") {
    import spark.implicits._
    val root = freshDir("store")
    spark.conf.set("spark.graft.ann.indexRoot", root)
    try {
      val t = s"${freshDir("corpus")}/tbl"
      val df = (0L until 100L).map(i => (i, s"p$i")).toDF("id", "v")
      TxnLog.create(spark, t, df.filter(col("id") < 60))
      var fulls = 0
      var deltas = 0
      def resolve(): AnnIndexStore.ChainedIndex =
        AnnIndexStore.ensureIncremental(spark, t, "spec", "p=1") {
          (out, _) => fulls += 1; touch(out, "postings")
        } { (_, out, _, _) => deltas += 1; touch(out, "postings") }

      val c0 = resolve()
      assert(fulls === 1 && deltas === 0)
      assert(c0.postingsDirs.size === 1 && c0.trainedAt === 0L)

      // Same version: resolved from the pointer, no builder runs.
      val c0b = resolve()
      assert(fulls === 1 && deltas === 0 && c0b.dir === c0.dir)

      // Pure append: delta generation, quantizer version pinned.
      TxnLog.append(spark, t, df.filter(col("id") >= 60))
      val c1 = resolve()
      assert(fulls === 1 && deltas === 1)
      assert(c1.postingsDirs.size === 2 && c1.trainedAt === 0L)
      assert(c1.postingsDirs.head === c0.postingsDirs.head,
        "the chain must reference the parent's postings, not copy them")

      // Re-resolution at the refreshed version: cached again.
      val c1b = resolve()
      assert(fulls === 1 && deltas === 1 && c1b.dir === c1.dir)

      // A delete (removes in the interval) forces the full path.
      TxnLog.delete(spark, t, col("id") % 10 === 0)
      val c2 = resolve()
      assert(fulls === 2 && deltas === 1)
      assert(c2.postingsDirs.size === 1 && c2.trainedAt === 2L)

      // A MoR delete produces NO file removes — only a DV binding —
      // but it still changes visible content: an already-built
      // generation's postings would keep serving the masked rows, so
      // it must ALSO force the full path, never a delta.
      TxnLog.deleteMoR(spark, t, col("id") === 7L)
      val c3 = resolve()
      assert(fulls === 3 && deltas === 1,
        "a DV-only interval must retrain, not delta-refresh")
      assert(c3.postingsDirs.size === 1 && c3.trainedAt === 3L)
    } finally spark.conf.unset("spark.graft.ann.indexRoot")
  }

  test("IVF refresh never retrains on append: generation models are " +
       "row-identical and postings cover exactly the corpus") {
    val d = "/root/testdata/sf0.001"
    val root = freshDir("ivfstore")
    spark.conf.set("spark.graft.ann.indexRoot", root)
    try {
      val t = s"${freshDir('i' + "vfcorpus")}/tbl"
      val emb = graft.sources.Tables.embeddings(spark, d)
      TxnLog.create(spark, t, emb.filter(col("vec_id") % 5 =!= 0))
      val (c0, m0) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      TxnLog.append(spark, t, emb.filter(col("vec_id") % 5 === 0))
      val (c1, m1) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      assert(c0.postingsDirs.size === 1 && c1.postingsDirs.size === 2)
      // Pinned quantizer: the refreshed head's model equals the root's.
      val rows0 = m0.orderBy("cid").collect().map(_.toString).toSeq
      val rows1 = m1.orderBy("cid").collect().map(_.toString).toSeq
      assert(rows0 === rows1, "refresh must not retrain the quantizer")
      // Postings across the chain cover every vector exactly once.
      val ids = c1.postingsDirs
        .map(p => spark.read.parquet(p).select("cand_id"))
        .reduce(_ union _).collect().map(_.getLong(0)).sorted.toSeq
      val want = emb.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === want)
    } finally spark.conf.unset("spark.graft.ann.indexRoot")
  }

  test("a chain deepens across MULTIPLE refreshes: three generations, " +
       "one quantizer, exact coverage at every step") {
    val d = "/root/testdata/sf0.001"
    val root = freshDir("deepstore")
    spark.conf.set("spark.graft.ann.indexRoot", root)
    try {
      val t = s"${freshDir("deepcorpus")}/tbl"
      val emb = graft.sources.Tables.embeddings(spark, d)
      TxnLog.create(spark, t, emb.filter(col("vec_id") % 3 === 0))
      val (c0, m0) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      TxnLog.append(spark, t, emb.filter(col("vec_id") % 3 === 1))
      val (c1, _) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      TxnLog.append(spark, t, emb.filter(col("vec_id") % 3 === 2))
      val (c2, m2) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      assert(c0.postingsDirs.size === 1 && c1.postingsDirs.size === 2 &&
        c2.postingsDirs.size === 3)
      assert(c2.postingsDirs.take(2) === c1.postingsDirs,
        "the deeper chain must extend, not rebuild, the shallower one")
      assert(m0.orderBy("cid").collect().map(_.toString).toSeq ===
        m2.orderBy("cid").collect().map(_.toString).toSeq,
        "three generations, one pinned quantizer")
      val ids = c2.postingsDirs
        .map(p => spark.read.parquet(p).select("cand_id"))
        .reduce(_ union _).collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === emb.select("vec_id").collect()
        .map(_.getLong(0)).sorted.toSeq)
    } finally spark.conf.unset("spark.graft.ann.indexRoot")
  }

  test("the index follows a STREAMING ingest: sink-committed batches " +
       "refresh as one delta generation, full coverage") {
    val d = "/root/testdata/sf0.001"
    val root = freshDir("sstore")
    spark.conf.set("spark.graft.ann.indexRoot", root)
    try {
      val t = s"${freshDir("scorpus")}/tbl"
      val srcT = s"${freshDir("ssrc")}/tbl"
      val emb = graft.sources.Tables.embeddings(spark, d)
      TxnLog.create(spark, t, emb.filter(col("vec_id") % 5 =!= 0))
      val (c0, _) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      assert(c0.postingsDirs.size === 1)
      // The delta arrives through the exactly-once streaming sink —
      // the production ingest path the index must follow.
      TxnLog.create(spark, srcT, emb.filter(col("vec_id") % 5 === 0))
      val q = spark.readStream.format("graft-txn").load(srcT)
        .writeStream.format("graft-txn")
        .option("path", t).option("streamId", "ivf-ingest")
        .option("checkpointLocation", freshDir("sckpt"))
        .start()
      try q.processAllAvailable() finally q.stop()
      val (c1, _) = graft.queries.VectorQueries
        .ensureIvfIndexIncremental(spark, t, lloydIters = 1)
      assert(c1.postingsDirs.size === 2,
        "the sink's append must land as ONE delta generation")
      val ids = c1.postingsDirs
        .map(p => spark.read.parquet(p).select("cand_id"))
        .reduce(_ union _).collect().map(_.getLong(0)).sorted.toSeq
      val want = emb.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(ids === want)
    } finally spark.conf.unset("spark.graft.ann.indexRoot")
  }
}
