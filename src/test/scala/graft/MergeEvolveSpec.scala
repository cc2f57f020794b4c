package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Clause-form MERGE WITH SCHEMA EVOLUTION pins: source-only columns
  * evolve the target additively inside the merge's own commit, star
  * actions expand over the evolved shape, explicit clauses may assign
  * the new columns, untouched rows read them as NULL, and WITHOUT the
  * flag the same statements still refuse (enforcement unchanged). The
  * fast-path (equi-key star) evolution is pinned in GraftSqlDmlSpec;
  * this suite covers the general clause executor. */
class MergeEvolveSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_mevo_${spark.sparkContext.applicationId}_$tag"
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  private def target(tag: String): String = {
    import spark.implicits._
    val t = freshDir(tag)
    TxnLog.create(spark, t,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"))
    t
  }

  test("evolve=true adds source extras; star-equivalent explicit SET " +
       "fills them on matched rows, others read NULL") {
    import spark.implicits._
    val t = target("set")
    val src = Seq((2L, "B", 20L), (9L, "I", 90L)).toDF("id", "s", "extra")
    TxnLog.mergeClauses(spark, t, src, col("id") === col("__s_id"),
      matched = Seq(TxnLog.MergeUpdate(None,
        Map("s" -> col("__s_s"), "extra" -> col("__s_extra")))),
      notMatched = Seq(TxnLog.MergeInsert(None,
        Map("id" -> col("__s_id"), "s" -> col("__s_s"),
          "extra" -> col("__s_extra")))),
      evolve = true)
    val out = TxnLog.read(spark, t)
      .select("id", "s", "extra").as[(Long, String, Option[Long])]
      .collect().toSet
    assert(out === Set((1L, "a", None), (2L, "B", Some(20L)),
      (3L, "c", None), (9L, "I", Some(90L))))
    // The evolution is recorded: a later plain append may carry it.
    assert(TxnLog.tableSchema(spark, t).get.fieldNames.toSeq
      === Seq("id", "s", "extra"))
  }

  test("without evolve, a clause naming a source-only column refuses " +
       "and nothing commits") {
    import spark.implicits._
    val t = target("refuse")
    val v = TxnLog.latestVersion(spark, t)
    val src = Seq((2L, "B", 20L)).toDF("id", "s", "extra")
    val e = intercept[IllegalArgumentException] {
      TxnLog.mergeClauses(spark, t, src, col("id") === col("__s_id"),
        matched = Seq(TxnLog.MergeUpdate(None,
          Map("extra" -> col("__s_extra")))))
    }
    assert(e.getMessage.contains("extra"))
    assert(TxnLog.latestVersion(spark, t) === v)
  }

  test("evolution composes with conditional DELETE and NOT MATCHED BY " +
       "SOURCE clauses") {
    import spark.implicits._
    val t = target("clauses")
    val src = Seq((1L, "A", 10L), (2L, "B", 20L), (7L, "G", 70L))
      .toDF("id", "s", "extra")
    TxnLog.mergeClauses(spark, t, src, col("id") === col("__s_id"),
      matched = Seq(
        TxnLog.MergeDelete(Some(col("__s_extra") < 15L)),
        TxnLog.MergeUpdate(None, Map("extra" -> col("__s_extra")))),
      notMatched = Seq(TxnLog.MergeInsert(None,
        Map("id" -> col("__s_id"), "s" -> col("__s_s"),
          "extra" -> col("__s_extra")))),
      bySource = Seq(TxnLog.MergeUpdate(None, Map("s" -> lit("stale")))),
      evolve = true)
    val out = TxnLog.read(spark, t)
      .select("id", "s", "extra").as[(Long, String, Option[Long])]
      .collect().toSet
    // id=1 deleted (extra<15); id=2 keeps s, gains extra; id=3 is
    // by-source → s=stale, extra NULL; id=7 inserted with extra.
    assert(out === Set((2L, "b", Some(20L)), (3L, "stale", None),
      (7L, "G", Some(70L))))
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION drives the clause executor " +
       "end to end") {
    val dml = GraftSqlDmlSpec.session
    import dml.implicits._
    val root = freshDir("sqlroot")
    dml.conf.set("spark.sql.catalog.mevspec",
      classOf[graft.sources.GraftCatalog].getName)
    dml.conf.set("spark.sql.catalog.mevspec.root", root)
    val t = s"$root/ns/tm"
    TxnLog.create(dml, t,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    Seq((2L, "B", 20L), (5L, "E", 50L)).toDF("id", "s", "extra")
      .createOrReplaceTempView("mevo_sql_src")
    dml.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mevspec.ns.tm t
        |USING mevo_sql_src u ON t.id = u.id
        |WHEN MATCHED AND u.extra > 10 THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = TxnLog.read(dml, t)
      .select("id", "s", "extra").as[(Long, String, Option[Long])]
      .collect().toSet
    assert(out === Set((1L, "a", None), (2L, "B", Some(20L)),
      (5L, "E", Some(50L))))
  }
}
