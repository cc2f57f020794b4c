package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnIndexStore

/** Lifecycle pins for the persisted ANN index store: content-addressed
  * build-once reuse, invalidation on corpus change, parameter
  * separation, and atomic publish (a failed build never publishes).
  * Index CONTENT correctness is the q_ann_ivf_persist / q_hybrid_rrf
  * oracle gate's job. */
class AnnIndexStoreSpec extends AnyFunSuite with SparkSpec {

  private def freshCorpus(tag: String, n: Int = 5): String = {
    import spark.implicits._
    val d = s"${sys.props("java.io.tmpdir")}/graft_annidx_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    (0 until n).map(i => (i.toLong, Seq(i.toLong, 2L * i)))
      .toDF("vec_id", "embedding").write.parquet(d)
    d
  }

  test("ensure builds once and reuses: same corpus + params resolve " +
       "the SAME directory with zero rebuilds") {
    val corpus = freshCorpus("reuse")
    var builds = 0
    def ensure(): String =
      AnnIndexStore.ensure(spark, corpus, "spec", "p=1") { out =>
        builds += 1
        spark.range(3).write.parquet(s"$out/data")
      }
    val d1 = ensure()
    val d2 = ensure()
    assert(d1 === d2)
    assert(builds === 1, "second ensure must adopt the published artifact")
    assert(spark.read.parquet(s"$d2/data").count() === 3)
  }

  test("a corpus content change invalidates: new fingerprint, new " +
       "address, fresh build; the old artifact stays resolvable") {
    val corpus = freshCorpus("stale")
    var builds = 0
    def ensure(): String =
      AnnIndexStore.ensure(spark, corpus, "spec2", "p=1") { out =>
        builds += 1
        spark.range(1).write.parquet(s"$out/data")
      }
    val d1 = ensure()
    // Append a file to the corpus — length/listing changes.
    import spark.implicits._
    Seq((99L, Seq(1L, 1L))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(corpus)
    val d2 = ensure()
    assert(d1 !== d2, "changed corpus must map to a new index address")
    assert(builds === 2)
    val fs = new org.apache.hadoop.fs.Path(d1)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(d1)),
      "old artifact is immutable — a pinned reader may still hold it")
  }

  test("a TxnLog corpus fingerprints by LOG VERSION: commits invalidate, " +
       "vacuum/staging noise does not") {
    import spark.implicits._
    import graft.sources.TxnLog
    val d = s"${sys.props("java.io.tmpdir")}/graft_annidx_${spark.sparkContext.applicationId}_txn"
    val p = new org.apache.hadoop.fs.Path(d)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    TxnLog.create(spark, d, Seq((1L, Seq(1L))).toDF("vec_id", "embedding"))
    val f1 = AnnIndexStore.corpusFingerprint(spark, d)
    // Uncommitted staged junk is invisible content — same fingerprint.
    spark.range(1).write.parquet(s"$d/stage-junk")
    assert(AnnIndexStore.corpusFingerprint(spark, d) === f1)
    TxnLog.append(spark, d, Seq((2L, Seq(2L))).toDF("vec_id", "embedding"))
    assert(AnnIndexStore.corpusFingerprint(spark, d) !== f1,
      "a commit must change the corpus fingerprint")
  }

  test("different params → different artifacts; a throwing build " +
       "publishes NOTHING") {
    val corpus = freshCorpus("params")
    val a = AnnIndexStore.ensure(spark, corpus, "spec3", "nprobe=4") {
      out => spark.range(1).write.parquet(s"$out/data") }
    val b = AnnIndexStore.ensure(spark, corpus, "spec3", "nprobe=8") {
      out => spark.range(2).write.parquet(s"$out/data") }
    assert(a !== b)
    assert(spark.read.parquet(s"$a/data").count() === 1)
    assert(spark.read.parquet(s"$b/data").count() === 2)
    intercept[RuntimeException] {
      AnnIndexStore.ensure(spark, corpus, "spec3", "nprobe=16") { _ =>
        throw new RuntimeException("builder died") }
    }
    // The failed variant must not have published a half-built dir.
    val died = AnnIndexStore.ensure(spark, corpus, "spec3", "nprobe=16") {
      out => spark.range(5).write.parquet(s"$out/data") }
    assert(spark.read.parquet(s"$died/data").count() === 5,
      "a crashed build must leave no artifact behind")
  }
}
