package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MetaFanout, TxnLog}

/** Pins for the adaptive metadata fan-out behind FSCK's existence
  * probe and COPY INTO's source listing (round-17 optimization): the
  * serial and distributed legs must return the SAME verdicts — a
  * crossover that changed answers would be a correctness bug wearing
  * a performance hat. */
class MetaFanoutSpec extends AnyFunSuite with SparkSpec {

  private def root(tag: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_metafanout_${spark.sparkContext.applicationId}_$tag"

  test("adaptiveMap serial and distributed legs agree (order preserved)") {
    val items = (0 until 500).map(_.toLong)
    def run(): Seq[Long] = MetaFanout.adaptiveMap(spark, items,
      "spark.graft.test.fanout.localOps",
      "spark.graft.test.fanout.crossoverMs") { (_, x) =>
      if (x % 3 == 0) Nil else Seq(x * 2)
    }
    spark.conf.set("spark.graft.test.fanout.localOps", Int.MaxValue.toString)
    spark.conf.set("spark.graft.test.fanout.crossoverMs", "1e18")
    val serial = run()
    spark.conf.set("spark.graft.test.fanout.localOps", "0")
    val dist = run()
    spark.conf.unset("spark.graft.test.fanout.localOps")
    spark.conf.unset("spark.graft.test.fanout.crossoverMs")
    val adaptive = run()
    assert(serial === dist)
    assert(serial === adaptive)
    assert(serial === items.filter(_ % 3 != 0).map(_ * 2))
  }

  test("bloom sidecar footer reads: distributed leg builds identical segments") {
    import spark.implicits._
    def build(tag: String): (String, Seq[Long]) = {
      val t = root(s"bloomftr_$tag")
      val p = new Path(t)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val df = (0L until 400L).map(i => (i, s"n$i")).toDF("id", "s")
      TxnLog.createWithBloom(spark, t, df.repartition(8), Seq("id"))
      val probes = Seq(3L, 77L, 399L)
      val kept = graft.sources.TxnBloom.filterByBloom(spark, t, "id",
        probes, TxnLog.snapshotFull(spark, t))
      // The m-bit widths derive from the footer row counts the fan-out
      // read: identical widths ⇒ identical bitsets ⇒ the same rows
      // survive the file screen (rel names differ per table — compare
      // the surviving row ids, not paths).
      val ids = spark.read.parquet(kept.map(r => s"$t/${r._1}"): _*)
        .select("id").as[Long].collect().toSeq.sorted
      (t, ids)
    }
    val (_, serialKept) = build("serial")
    spark.conf.set("spark.graft.bloom.footer.localOps", "0")
    val (_, distKept) =
      try build("dist")
      finally spark.conf.unset("spark.graft.bloom.footer.localOps")
    assert(serialKept === distKept)
  }

  test("FSCK reports the same missing files on the distributed probe") {
    import spark.implicits._
    val t = root("fsck")
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    TxnLog.create(spark, t,
      (0L until 40L).map(i => (i, s"s$i")).toDF("id", "s").repartition(4))
    val lost = TxnLog.snapshot(spark, t).sorted.take(2)
    val lostRows = lost.map(rel =>
      spark.read.parquet(s"$t/$rel").count()).sum
    lost.foreach(rel => assert(fs.delete(new Path(t, rel), false)))
    def dry(): Seq[String] = TxnLog.fsck(spark, t, dryRun = true)
    val serialSaw = dry()
    spark.conf.set("spark.graft.fsck.probe.localOps", "0")
    val distSaw = dry()
    spark.conf.unset("spark.graft.fsck.probe.localOps")
    assert(serialSaw === distSaw)
    assert(serialSaw.sorted === lost)
    // The distributed leg repairs identically.
    spark.conf.set("spark.graft.fsck.probe.localOps", "0")
    assert(TxnLog.fsck(spark, t) === distSaw)
    spark.conf.unset("spark.graft.fsck.probe.localOps")
    assert(TxnLog.read(spark, t).count() === 40L - lostRows)
    fs.delete(p, true)
  }

  test("COPY INTO source listing: distributed walk finds the same files " +
       "and the glob still applies") {
    val src = root("copylist")
    val p = new Path(src)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    // A nested landing zone: 6 dirs × 4 files + hidden/system noise.
    for (d <- 0 until 6; i <- 0 until 4) {
      val f = fs.create(new Path(src, s"day$d/up$i.csv"), true)
      f.writeBytes("id\n1\n"); f.close()
    }
    fs.create(new Path(src, "day0/_SUCCESS"), true).close()
    fs.create(new Path(src, ".hidden/x.csv"), true).close()
    fs.create(new Path(src, "day1/notdata.txt"), true).close()
    def list(): Seq[String] =
      TxnLog.listSourceFiles(spark, src, Set(".csv", ".tsv")).sorted
    val serial = list()
    spark.conf.set("spark.graft.copy.list.localOps", "0")
    val dist = list()
    spark.conf.unset("spark.graft.copy.list.localOps")
    assert(serial === dist)
    assert(serial.size === 24)
    assert(serial.forall(_.endsWith(".csv")))
    assert(!serial.exists(_.contains(".hidden")))
    fs.delete(p, true)
  }
}
