package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** COPY INTO pins: exactly-once-per-source-file ingestion through the
  * ledger (idempotent re-run, incremental pickup of new files, FORCE
  * re-load), ledger survival across checkpoints and log cleanup, glob
  * PATTERN scoping, csv binding to the recorded schema, hive layout on
  * partitioned targets, and the SQL statement face. */
class CopyIntoSpec extends AnyFunSuite with SparkSpec {

  private def freshDir(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_copy_${spark.sparkContext.applicationId}_$tag"
    val p = new Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }

  private def batch(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo until hi).map(i => (i.toLong, s"s$i", (i % 3).toLong))
      .toDF("id", "s", "k")
  }

  /** One source "upload": a single-file parquet batch under its own
    * subdirectory (how landing zones actually receive files). */
  private def land(src: String, sub: String, lo: Int, hi: Int): Unit =
    batch(lo, hi).coalesce(1).write.parquet(s"$src/$sub")

  test("copy into loads once, re-run loads nothing and publishes no commit") {
    val src = freshDir("idem_src")
    val tbl = freshDir("idem_tbl")
    land(src, "u1", 0, 10)
    land(src, "u2", 10, 30)
    TxnLog.create(spark, tbl, batch(0, 0))
    val r1 = TxnLog.copyInto(spark, tbl, src)
    assert(r1.loaded === 2L && r1.skipped === 0L)
    assert(TxnLog.read(spark, tbl).count() === 30L)
    val vBefore = TxnLog.latestVersion(spark, tbl)
    val r2 = TxnLog.copyInto(spark, tbl, src)
    assert(r2.loaded === 0L && r2.skipped === 2L)
    assert(TxnLog.latestVersion(spark, tbl) === vBefore,
      "a no-op COPY must not publish a commit")
    assert(TxnLog.read(spark, tbl).count() === 30L)
  }

  test("copy into picks up only files landed since the last run") {
    val src = freshDir("incr_src")
    val tbl = freshDir("incr_tbl")
    land(src, "u1", 0, 10)
    TxnLog.create(spark, tbl, batch(0, 0))
    assert(TxnLog.copyInto(spark, tbl, src).loaded === 1L)
    land(src, "u2", 10, 25)
    val r = TxnLog.copyInto(spark, tbl, src)
    assert(r.loaded === 1L && r.skipped === 1L)
    assert(TxnLog.read(spark, tbl).count() === 25L)
    import spark.implicits._
    assert(TxnLog.read(spark, tbl).select("id").as[Long].collect().toSet
      === (0L until 25L).toSet, "incremental pickup must not duplicate")
  }

  test("PATTERN scopes the load to matching source-relative paths") {
    val src = freshDir("pat_src")
    val tbl = freshDir("pat_tbl")
    land(src, "a/u1", 0, 5)
    land(src, "b/u2", 5, 9)
    TxnLog.create(spark, tbl, batch(0, 0))
    val r = TxnLog.copyInto(spark, tbl, src, pattern = Some("a/**"))
    assert(r.loaded === 1L)
    assert(TxnLog.read(spark, tbl).count() === 5L)
    // Widening the pattern later ingests the rest exactly once.
    assert(TxnLog.copyInto(spark, tbl, src, pattern = Some("**")).loaded === 1L)
    assert(TxnLog.read(spark, tbl).count() === 9L)
  }

  test("FORCE re-loads ledgered files and records them again") {
    val src = freshDir("force_src")
    val tbl = freshDir("force_tbl")
    land(src, "u1", 0, 7)
    TxnLog.create(spark, tbl, batch(0, 0))
    assert(TxnLog.copyInto(spark, tbl, src).loaded === 1L)
    assert(TxnLog.copyInto(spark, tbl, src, force = true).loaded === 1L)
    assert(TxnLog.read(spark, tbl).count() === 14L,
      "FORCE loads regardless of the ledger")
    assert(TxnLog.copyInto(spark, tbl, src).loaded === 0L,
      "forced files are still recorded, so a later plain run skips them")
  }

  test("the ledger survives checkpointing and log cleanup") {
    val src = freshDir("ckpt_src")
    val tbl = freshDir("ckpt_tbl")
    land(src, "u1", 0, 10)
    TxnLog.create(spark, tbl, batch(100, 105))
    assert(TxnLog.copyInto(spark, tbl, src).loaded === 1L)
    // Push the log across a checkpoint boundary, then drop the old
    // v-files: the ledger must ride the checkpoint's full recording.
    (0 until TxnLog.CheckpointInterval + 2).foreach(i =>
      TxnLog.append(spark, tbl, batch(200 + i, 201 + i)))
    TxnLog.cleanupLog(spark, tbl, retainVersions = 2)
    assert(TxnLog.copyInto(spark, tbl, src).loaded === 0L,
      "idempotence must not depend on retaining the loading commit")
    assert(TxnLog.ingestLedger(spark, tbl).size === 1)
  }

  test("csv sources bind the recorded table schema") {
    val src = freshDir("csv_src")
    val tbl = freshDir("csv_tbl")
    batch(0, 6).coalesce(1).write.option("header", "true").csv(s"$src/u1")
    TxnLog.create(spark, tbl, batch(0, 0))
    val r = TxnLog.copyInto(spark, tbl, src, format = "csv")
    assert(r.loaded === 1L)
    import spark.implicits._
    assert(TxnLog.read(spark, tbl).select("id", "s", "k")
      .as[(Long, String, Long)].collect().toSet
      === (0 until 6).map(i => (i.toLong, s"s$i", (i % 3).toLong)).toSet)
  }

  test("a partitioned target lays copied rows out hive-style") {
    val src = freshDir("part_src")
    val tbl = freshDir("part_tbl")
    land(src, "u1", 0, 12)
    TxnLog.createPartitioned(spark, tbl, batch(0, 0), Seq("k"))
    assert(TxnLog.copyInto(spark, tbl, src).loaded === 1L)
    val live = TxnLog.snapshot(spark, tbl)
    assert(live.nonEmpty && live.forall(_.contains("k=")),
      s"copied files must land under partition segments, got $live")
    assert(TxnLog.read(spark, tbl).filter(col("k") === 1L).count() === 4L)
  }

  test("MERGE SCHEMA admits source-only columns as additive evolution " +
       "in the loading commit; without it the load refuses") {
    import spark.implicits._
    val src = freshDir("ms_src")
    val tbl = freshDir("ms_tbl")
    Seq((1L, "a", 9L)).toDF("id", "s", "extra")
      .coalesce(1).write.parquet(s"$src/u1")
    TxnLog.create(spark, tbl, batch(0, 0).select("id", "s"))
    val e = intercept[IllegalArgumentException] {
      TxnLog.copyInto(spark, tbl, src)
    }
    assert(e.getMessage.contains("extra"))
    // The refused attempt recorded NOTHING: the mergeSchema retry
    // still sees the file as fresh.
    val r = TxnLog.copyInto(spark, tbl, src, mergeSchema = true)
    assert(r.loaded === 1L)
    assert(TxnLog.tableSchema(spark, tbl).get.fieldNames.toSeq
      === Seq("id", "s", "extra"))
    assert(TxnLog.read(spark, tbl).select("id", "extra")
      .as[(Long, Option[Long])].collect().toSet === Set((1L, Some(9L))))
    val sql = GraftSqlDmlSpec.session
    Seq((2L, "b", 8L, true)).toDF("id", "s", "extra", "flag")
      .coalesce(1).write.parquet(s"$src/u2")
    val out = sql.sql(s"COPY INTO '$tbl' FROM '$src' MERGE SCHEMA")
      .collect().head
    assert(out.getLong(1) === 1L)
    assert(TxnLog.tableSchema(sql, tbl).get.fieldNames.toSeq
      === Seq("id", "s", "extra", "flag"))
  }

  test("COPY INTO commits flow through the incremental stream source " +
       "like any append") {
    import spark.implicits._
    val src = freshDir("st_src")
    val tbl = freshDir("st_tbl")
    TxnLog.create(spark, tbl, batch(0, 5))
    land(src, "u1", 10, 20)
    TxnLog.copyInto(spark, tbl, src)
    val q = spark.readStream.format("graft-txn").load(tbl)
      .writeStream.format("memory")
      .queryName("copy_stream_sink").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT id FROM copy_stream_sink")
        .as[Long].collect().toSet
      assert(got === (0L until 5L).toSet ++ (10L until 20L).toSet,
        "the copy commit's files must arrive as one incremental batch")
    } finally q.stop()
  }

  test("auto-compaction folds in after batch appends and COPY INTO — " +
       "small-file count stays bounded") {
    import spark.implicits._
    val src = freshDir("ac_src")
    val tbl = freshDir("ac_tbl")
    TxnLog.create(spark, tbl, batch(0, 0))
    spark.conf.set("spark.graft.autoCompact.minFiles", "4")
    try {
      (0 until 6).foreach(i =>
        TxnLog.append(spark, tbl, batch(i * 10, i * 10 + 10).coalesce(1)))
      val afterAppends = TxnLog.snapshot(spark, tbl).size
      assert(afterAppends < 6,
        s"6 tiny appends must auto-compact below 6 files, got $afterAppends")
      (0 until 4).foreach(i => land(src, s"u$i", 100 + i * 5, 105 + i * 5))
      TxnLog.copyInto(spark, tbl, src)
      val afterCopy = TxnLog.snapshot(spark, tbl).size
      assert(afterCopy < afterAppends + 4,
        s"COPY INTO of 4 tiny uploads must auto-compact, got $afterCopy")
    } finally spark.conf.unset("spark.graft.autoCompact.minFiles")
    import org.apache.spark.sql.functions.col
    assert(TxnLog.read(spark, tbl).select(col("id")).as[Long]
      .collect().toSet === ((0L until 60L) ++ (100L until 120L)).toSet,
      "auto-compaction must never change the row population")
  }

  test("concurrent COPY INTO of the same landing zone stays " +
       "exactly-once per file — the ledger re-check inside the " +
       "commit attempt") {
    import spark.implicits._
    val src = freshDir("race_src")
    val tbl = freshDir("race_tbl")
    (0 until 6).foreach(i => land(src, s"u$i", i * 10, i * 10 + 10))
    TxnLog.create(spark, tbl, batch(0, 0))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val loaded = new java.util.concurrent.atomic.AtomicLong(0)
    val threads = (0 until 3).map(_ => new Thread(() =>
      try loaded.addAndGet(TxnLog.copyInto(spark, tbl, src).loaded)
      catch { case e: Throwable => errors.add(e) }))
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errors.isEmpty,
      s"copy race surfaced: ${errors.toArray.mkString("; ")}")
    assert(loaded.get() === 6L,
      s"the three racers must load each file exactly once, loaded ${loaded.get()}")
    assert(TxnLog.read(spark, tbl).count() === 60L,
      "no row may load twice under the race")
    assert(TxnLog.read(spark, tbl).select("id").as[Long].collect().toSet
      === (0L until 60L).toSet)
    assert(TxnLog.ingestLedger(spark, tbl).size === 6)
  }

  test("table_ingests exposes the ledger with loading versions") {
    val dml = GraftSqlDmlSpec.session
    val src = freshDir("tvf_src")
    val tbl = freshDir("tvf_tbl")
    land(src, "u1", 0, 5)
    TxnLog.create(dml, tbl, batch(0, 0))
    val v1 = TxnLog.copyInto(dml, tbl, src).version
    land(src, "u2", 5, 9)
    val v2 = TxnLog.copyInto(dml, tbl, src).version
    val rows = dml.sql(s"SELECT * FROM table_ingests('$tbl')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.length === 2)
    assert(rows.map(_._2).sorted === Seq(v1, v2))
    assert(rows.forall(_._1.contains("tvf_src")))
    // Version-pinned view: only the first load is visible at v1.
    assert(dml.sql(s"SELECT * FROM table_ingests('$tbl', $v1)")
      .count() === 1L)
  }

  test("COPY INTO is a SQL statement with version/loaded/skipped output") {
    val dml = GraftSqlDmlSpec.session
    val src = freshDir("sql_src")
    val tbl = freshDir("sql_tbl")
    land(src, "u1", 0, 8)
    TxnLog.create(dml, tbl, batch(0, 0))
    val out = dml.sql(s"COPY INTO '$tbl' FROM '$src'").collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L && out.head.getLong(2) === 0L)
    val again = dml.sql(
      s"COPY INTO '$tbl' FROM '$src' FILEFORMAT parquet PATTERN '**' FORCE")
      .collect().head
    assert(again.getLong(1) === 1L, "FORCE through SQL re-loads")
    assert(TxnLog.read(dml, tbl).count() === 16L)
  }
}
