package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Column mapping (RENAME/DROP COLUMN as pure metadata commits) —
  * the slot-identity properties DuckDB cannot see: physical files stay
  * byte-identical across renames, a re-added dropped name binds a
  * FRESH slot (old data never resurrects), the retired set survives
  * checkpoint replay, and every read/DML/CDC surface translates
  * physical→logical names. The data path is oracle-checked by
  * q_txn_column_map. */
class ColumnMappingSpec extends AnyFunSuite with SparkSpec {

  private def freshTable(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_cmap_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  private def mkDocs(s: SparkSession, n: Int) = {
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"t$i", (i * 37 % 500).toLong))
      .toDF("id", "txt", "n")
  }

  test("rename is metadata-only: values survive under the new name, " +
       "data files untouched, old version time-travels under the old name") {
    val t = freshTable("rename")
    TxnLog.create(spark, t, mkDocs(spark, 40))
    val filesBefore = TxnLog.snapshot(spark, t).toSet
    TxnLog.renameColumn(spark, t, "n", "len")
    assert(TxnLog.snapshot(spark, t).toSet === filesBefore,
      "rename must not move a single data file")
    val df = TxnLog.read(spark, t)
    assert(df.columns.toSeq === Seq("id", "txt", "len"))
    // The load-bearing assertion: values are PRESENT (a naive scan
    // under the logical schema silently returns all-null here).
    assert(df.filter(col("len").isNull).count() === 0)
    assert(df.agg(sum("len")).head().getLong(0) ===
      (0 until 40).map(i => (i * 37 % 500).toLong).sum)
    // Time travel to v0 presents the pre-rename shape.
    assert(TxnLog.read(spark, t, Some(0)).columns.toSeq === Seq("id", "txt", "n"))
  }

  test("append, delete, and MoR update bind the RENAMED name; stats " +
       "and compaction stay correct on a mapped table") {
    val t = freshTable("dml")
    TxnLog.createWithStats(spark, t, mkDocs(spark, 40), Seq("n"))
    TxnLog.renameColumn(spark, t, "n", "len")
    // Append under the new logical name → staged under the OLD
    // physical slot; a reader must see old and new rows in one column.
    import spark.implicits._
    TxnLog.append(spark, t,
      Seq((100L, "x", 9999L)).toDF("id", "txt", "len"))
    assert(TxnLog.read(spark, t).filter(col("len") === 9999L).count() === 1)
    // COW delete with a predicate on the renamed column.
    TxnLog.delete(spark, t, col("len") === 9999L)
    assert(TxnLog.read(spark, t).filter(col("id") === 100L).count() === 0)
    assert(TxnLog.read(spark, t).filter(col("len").isNull).count() === 0,
      "post-delete rewrite must stage under the physical slot")
    // MoR update SETting the renamed column.
    TxnLog.updateMoR(spark, t, col("id") === 0L, Map("len" -> lit(7777L)))
    val updated = TxnLog.read(spark, t)
    assert(updated.filter(col("id") === 0L).select("len").head().getLong(0) === 7777L)
    assert(updated.count() === 40)
    // Compaction materializes the mask and re-stages physically.
    TxnLog.compact(spark, t, targetFiles = 2, clusterBy = Seq(col("len")))
    val compacted = TxnLog.read(spark, t)
    assert(compacted.count() === 40)
    assert(compacted.filter(col("len").isNull).count() === 0)
    assert(compacted.filter(col("id") === 0L).select("len").head().getLong(0) === 7777L)
  }

  test("drop then re-add the same name binds a FRESH slot: old data " +
       "must not resurrect, and the retired set survives checkpoints") {
    val t = freshTable("readd")
    TxnLog.create(spark, t, mkDocs(spark, 20))
    TxnLog.dropColumn(spark, t, "txt")
    assert(TxnLog.read(spark, t).columns.toSeq === Seq("id", "n"))
    // Cross a checkpoint boundary (interval 10) so the retired set
    // must survive replay FROM THE CHECKPOINT, not just the tail.
    import spark.implicits._
    (0 until TxnLog.CheckpointInterval + 2).foreach { i =>
      TxnLog.append(spark, t, Seq((1000L + i, 5L)).toDF("id", "n"))
    }
    TxnLog.addColumns(spark, t,
      Seq(org.apache.spark.sql.types.StructField("txt",
        org.apache.spark.sql.types.StringType)))
    val df = TxnLog.read(spark, t)
    assert(df.columns.toSeq === Seq("id", "n", "txt"))
    assert(df.filter(col("txt").isNotNull).count() === 0,
      "re-added column resurrected dropped data — the retired slot leaked")
    // New writes to the re-added column land and read back.
    TxnLog.append(spark, t, Seq((5000L, 1L, "fresh")).toDF("id", "n", "txt"))
    assert(TxnLog.read(spark, t).filter(col("txt") === "fresh").count() === 1)
    // mergeSchema append of the retired NAME as an evolution extra is
    // refused (its physical slot would shadow old data). The re-add
    // above went through addColumns, which assigns a fresh slot.
    val t2 = freshTable("readd2")
    TxnLog.create(spark, t2, mkDocs(spark, 5))
    TxnLog.dropColumn(spark, t2, "txt")
    val err = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t2,
        Seq((9L, 1L, "zz")).toDF("id", "n", "txt"), mergeSchema = true)
    }
    assert(err.getMessage.contains("retired"))
  }

  test("rename survives checkpoint replay and old snapshots keep the " +
       "old name; CDC reads churn through the mapping") {
    val t = freshTable("ckpt")
    TxnLog.create(spark, t, mkDocs(spark, 10))
    TxnLog.renameColumn(spark, t, "txt", "body")
    import spark.implicits._
    (0 until TxnLog.CheckpointInterval + 1).foreach { i =>
      TxnLog.append(spark, t, Seq((2000L + i, s"b$i", 1L)).toDF("id", "body", "n"))
    }
    val df = TxnLog.read(spark, t)
    assert(df.columns.toSeq === Seq("id", "body", "n"))
    assert(df.filter(col("body").isNull).count() === 0)
    assert(TxnLog.read(spark, t, Some(0)).columns.toSeq === Seq("id", "txt", "n"))
    // CDC across a post-rename delete: changed rows present VALUES in
    // the renamed column (the raw-file diff must translate names too).
    val v = TxnLog.latestVersion(spark, t)
    TxnLog.delete(spark, t, col("id") === 0L)
    val cdc = TxnLog.changes(spark, t, v, v + 1)
    assert(cdc.filter(col("_change") === "delete").count() === 1)
    assert(cdc.filter(col("_change") === "delete")
      .select("body").head().getString(0) === "t0")
  }

  test("create/overwrite from a mapped read re-baseline PLAIN: the " +
       "inherited mapping metadata must not poison the new table") {
    val t = freshTable("baseline")
    TxnLog.create(spark, t, mkDocs(spark, 15))
    TxnLog.renameColumn(spark, t, "n", "len")
    val mappedRead = TxnLog.read(spark, t) // aliases carry mapping metadata
    val t2 = freshTable("baseline2")
    TxnLog.create(spark, t2, mappedRead)
    val df2 = TxnLog.read(spark, t2)
    assert(df2.columns.toSeq === Seq("id", "txt", "len"))
    assert(df2.filter(col("len").isNull).count() === 0,
      "create recorded a stale physical binding — reads bind absent slots")
    // Overwrite of the ORIGINAL table with its own mapped read.
    TxnLog.overwrite(spark, t, mappedRead.filter(col("id") < 5))
    val ow = TxnLog.read(spark, t)
    assert(ow.count() === 5 && ow.filter(col("len").isNull).count() === 0)
  }

  test("the streaming source tails a RENAMED table with values intact " +
       "in both the initial snapshot and the incremental per-commit reads") {
    import spark.implicits._
    val t = freshTable("stream")
    TxnLog.create(spark, t, mkDocs(spark, 6))
    TxnLog.renameColumn(spark, t, "txt", "body")
    val q = spark.readStream.format("graft-txn").load(t)
      .writeStream.format("memory").queryName("cmap_tail").start()
    try {
      q.processAllAvailable()
      val snap = spark.table("cmap_tail")
      assert(snap.columns.toSeq === Seq("id", "body", "n"))
      assert(snap.filter(col("body").isNull).count() === 0,
        "initial snapshot lost renamed-column values")
      // Incremental path: a post-rename append's files carry the
      // physical slot; the per-commit read must translate too.
      TxnLog.append(spark, t, Seq((50L, "fresh", 2L)).toDF("id", "body", "n"))
      q.processAllAvailable()
      assert(spark.table("cmap_tail").filter(col("body") === "fresh").count() === 1)
      assert(spark.table("cmap_tail").filter(col("body").isNull).count() === 0,
        "incremental read lost renamed-column values")
    } finally q.stop()
  }

  test("SQL surface: ALTER RENAME/DROP/ADD through the catalog, scans " +
       "translate names, and a mapped scan without extensions refuses") {
    val dml = GraftSqlDmlSpec.session
    val root = s"${sys.props("java.io.tmpdir")}/graft_cmap_sql_${System.nanoTime()}"
    dml.conf.set("spark.sql.catalog.cmap", classOf[graft.sources.GraftCatalog].getName)
    dml.conf.set("spark.sql.catalog.cmap.root", root)
    dml.conf.set("spark.sql.catalog.cmap.writable", "true")
    TxnLog.create(dml, s"$root/ns/t", mkDocs(dml, 12))
    dml.sql("ALTER TABLE cmap.ns.t RENAME COLUMN txt TO body")
    val rows = dml.sql("SELECT id, body FROM cmap.ns.t WHERE body IS NOT NULL")
    assert(rows.count() === 12,
      "SQL scan of a renamed column returned nulls — physical names leaked")
    dml.sql("UPDATE cmap.ns.t SET body = concat(body, '!') WHERE id = 3")
    assert(dml.sql("SELECT body FROM cmap.ns.t WHERE id = 3")
      .head().getString(0) === "t3!")
    dml.sql("ALTER TABLE cmap.ns.t DROP COLUMN n")
    assert(dml.sql("SELECT * FROM cmap.ns.t").columns.toSeq === Seq("id", "body"))
    dml.sql("ALTER TABLE cmap.ns.t ADD COLUMNS (n BIGINT)")
    assert(dml.sql("SELECT count(*) FROM cmap.ns.t WHERE n IS NOT NULL")
      .head().getLong(0) === 0, "re-added column resurrected dropped data via SQL")
    // The shared extension-FREE session must refuse, not corrupt.
    spark.conf.set("spark.sql.catalog.cmapx", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cmapx.root", root)
    // (The UPDATE above also left a DV, so either refusal is correct —
    // the point is the scan REFUSES rather than returning nulls.)
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM cmapx.ns.t").collect()
    }
    assert(e.getMessage.contains("column mapping") ||
      e.getMessage.contains("deletion vectors"))
    // A mapped table WITHOUT DVs must refuse on the mapping itself.
    TxnLog.create(spark, s"$root/ns/plain", mkDocs(spark, 3))
    TxnLog.renameColumn(spark, s"$root/ns/plain", "txt", "body")
    val e2 = intercept[Exception] {
      spark.sql("SELECT * FROM cmapx.ns.plain").collect()
    }
    assert(e2.getMessage.contains("column mapping"))
  }
}
