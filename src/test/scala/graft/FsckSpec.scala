package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** FSCK REPAIR pins: a physically-lost data file breaks every scan
  * until repair drops its reference in one metadata commit; dry-run
  * reports without committing; a healthy table repairs to nothing
  * and publishes nothing; the SQL face returns the dead paths. */
class FsckSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(tag: String): String = {
    import spark.implicits._
    val t = s"${sys.props("java.io.tmpdir")}/graft_fsck_${spark.sparkContext.applicationId}_$tag"
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    TxnLog.create(spark, t,
      (0L until 30L).map(i => (i, s"s$i")).toDF("id", "s").repartition(3))
    t
  }

  private def loseOneFile(t: String): String = {
    val rel = TxnLog.snapshot(spark, t).head
    val p = new Path(t, rel)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, false), s"fixture could not delete $rel")
    rel
  }

  test("a lost file breaks the scan; DRY RUN reports without fixing; " +
       "repair drops the reference and the table reads again") {
    val t = freshTable("basic")
    val before = TxnLog.read(spark, t).count()
    val lost = loseOneFile(t)
    intercept[Exception] { TxnLog.read(spark, t).count() }
    val v = TxnLog.latestVersion(spark, t)
    assert(TxnLog.fsck(spark, t, dryRun = true) === Seq(lost))
    assert(TxnLog.latestVersion(spark, t) === v, "dry run must not commit")
    intercept[Exception] { TxnLog.read(spark, t).count() }
    assert(TxnLog.fsck(spark, t) === Seq(lost))
    assert(TxnLog.latestVersion(spark, t) === v + 1,
      "repair is one metadata commit")
    val after = TxnLog.read(spark, t).count()
    assert(after < before && after > 0,
      s"the lost file's rows are gone, the rest read ($after of $before)")
  }

  test("a healthy table repairs to nothing and publishes nothing") {
    val t = freshTable("healthy")
    val v = TxnLog.latestVersion(spark, t)
    assert(TxnLog.fsck(spark, t) === Nil)
    assert(TxnLog.latestVersion(spark, t) === v)
  }

  test("FSCK REPAIR is a SQL statement returning the dead paths") {
    val dml = GraftSqlDmlSpec.session
    val t = freshTable("sql")
    val lost = loseOneFile(t)
    assert(dml.sql(s"FSCK REPAIR '$t' DRY RUN")
      .collect().map(_.getString(0)).toSeq === Seq(lost))
    assert(dml.sql(s"FSCK REPAIR '$t'")
      .collect().map(_.getString(0)).toSeq === Seq(lost))
    assert(TxnLog.read(dml, t).count() === 20L)
  }

  test("repair composes with deletion vectors: a lost masked file's " +
       "binding rides out with its entry") {
    val t = freshTable("dv")
    TxnLog.deleteMoR(spark, t, col("id") % 3 === 0)
    val masked = TxnLog.snapshotFull(spark, t)
      .find(_._2.dv.isDefined).map(_._1)
    assume(masked.isDefined, "fixture should mask at least one file")
    val p = new Path(t, masked.get)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false)
    assert(TxnLog.fsck(spark, t) === Seq(masked.get))
    assert(TxnLog.snapshotFull(spark, t).forall(_._1 != masked.get))
    // The surviving read applies the remaining masks correctly.
    assert(TxnLog.read(spark, t).filter(col("id") % 3 === 0).count() === 0L)
  }
}
