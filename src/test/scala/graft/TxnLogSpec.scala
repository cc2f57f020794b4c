package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Tables, TxnLog}

/** ACID-property pins for the versioned transaction log. The data
  * through the log is oracle-checked (q_time_travel); these tests pin
  * what DuckDB cannot see: snapshot isolation against staged/physical
  * state, optimistic-concurrency races, logical-vs-physical deletion,
  * and checkpointed snapshot resolution. */
class TxnLogSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def freshTable(tag: String): String = {
    val t = s"${sys.props("java.io.tmpdir")}/graft_txn_${spark.sparkContext.applicationId}_$tag"
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    t
  }
  private def docs = Tables.documents(spark, sf)
    .select("doc_id", "lang", "n_chars")

  test("append commits are snapshots: each version replays its prefix") {
    val t = freshTable("append")
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 20))
    TxnLog.append(spark, t, docs.filter(col("doc_id") >= 20))
    val v0 = TxnLog.read(spark, t, Some(0)).count()
    val v1 = TxnLog.read(spark, t, Some(1)).count()
    val latest = TxnLog.read(spark, t).count()
    assert(v0 == docs.filter(col("doc_id") < 20).count())
    assert(v1 == docs.count() && latest == v1)
  }

  test("staged or rogue files are invisible: reads resolve from the log only") {
    val t = freshTable("rogue")
    TxnLog.create(spark, t, docs)
    // A crashed writer's leftovers: a full parquet directory inside the
    // table that no commit references.
    docs.limit(7).write.parquet(s"$t/stage-deadbeef")
    assert(TxnLog.read(spark, t).count() == docs.count(),
      "uncommitted staged files leaked into a snapshot read")
  }

  test("overwrite replaces atomically; the old content stays time-travelable") {
    val t = freshTable("ow")
    TxnLog.create(spark, t, docs.filter(col("lang") === "en"))
    TxnLog.overwrite(spark, t, docs.filter(col("lang") === "de"))
    assert(TxnLog.read(spark, t).select("lang").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("de"))
    assert(TxnLog.read(spark, t, Some(0)).select("lang").distinct()
      .collect().map(_.getString(0)).toSeq == Seq("en"))
  }

  test("compaction is logical: rows identical, fewer files, old version intact") {
    val t = freshTable("compact")
    TxnLog.create(spark, t, docs.repartition(13))
    val before = TxnLog.snapshot(spark, t).size
    val r = TxnLog.compact(spark, t, targetFiles = 2)
    assert(r.removed == before && TxnLog.snapshot(spark, t).size <= 4)
    val now = TxnLog.read(spark, t).orderBy("doc_id").collect().toSeq
    val old = TxnLog.read(spark, t, Some(0)).orderBy("doc_id").collect().toSeq
    assert(now == old, "compaction changed the rows")
  }

  test("vacuum deletes only what no retained version references") {
    val t = freshTable("vacuum")
    TxnLog.create(spark, t, docs.repartition(8))
    TxnLog.compact(spark, t, targetFiles = 1)
    val fragments = TxnLog.snapshot(spark, t, Some(0)).toSet
    val deleted = TxnLog.vacuum(spark, t, retainVersions = 1,
      retainMillis = 0L).toSet
    assert(deleted == fragments,
      "vacuum must delete exactly the superseded fragments")
    // The latest snapshot survives physically and logically.
    assert(TxnLog.read(spark, t).count() == docs.count())
  }

  test("vacuum retention guard: an in-flight writer's staged files are " +
       "spared; an old abandoned stage dir IS collected") {
    val t = freshTable("vacage")
    TxnLog.create(spark, t, docs)
    // The data-loss race (round-11 verdict): a concurrent writer has
    // STAGED its files but not yet published the commit referencing
    // them. They are unreferenced by every retained version — exactly
    // what a retention-less vacuum deletes — and the writer's commit
    // would then succeed against deleted data.
    docs.limit(5).write.parquet(s"$t/stage-inflight0")
    val dead1 = TxnLog.vacuum(spark, t, retainVersions = 1)
    assert(!dead1.exists(_.startsWith("stage-inflight0/")),
      "vacuum deleted a fresh staged file inside the retention window")
    // The spared writer can now publish: the table reads intact.
    val p = new org.apache.hadoop.fs.Path(t)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedRel = fs.listStatus(new org.apache.hadoop.fs.Path(t, "stage-inflight0"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
      .map(n => s"stage-inflight0/$n").toSeq
    assert(stagedRel.nonEmpty)
    // An ABANDONED attempt older than the window is garbage and goes:
    // backdate a second stage dir past the retention age.
    docs.limit(3).write.parquet(s"$t/stage-abandoned")
    fs.listStatus(new org.apache.hadoop.fs.Path(t, "stage-abandoned"))
      .foreach(st => fs.setTimes(st.getPath,
        System.currentTimeMillis() - 8L * 24 * 3600 * 1000, -1))
    val dead2 = TxnLog.vacuum(spark, t, retainVersions = 1)
    assert(dead2.nonEmpty && dead2.forall(_.startsWith("stage-abandoned/")),
      s"expected only the aged-out abandoned staging to be collected, got $dead2")
    assert(TxnLog.read(spark, t).count() == docs.count())
  }

  test("concurrent additive schema evolutions both survive a rebase") {
    import spark.implicits._
    val t = freshTable("schemarace")
    TxnLog.create(spark, t, docs)
    // Two writers evolve additively at the same time: each computed
    // its merged schema from the same base, so without per-attempt
    // re-merge the loser's recording would silently drop the winner's
    // column (round-11 advice, medium).
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq("extra_a", "extra_b").map { c =>
      new Thread(() => {
        try TxnLog.append(spark, t,
          docs.limit(2).withColumn(c, lit(1L)), mergeSchema = true)
        catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent evolving append failed: ${errs.peek()}")
    val names = TxnLog.tableSchema(spark, t).get.fieldNames.toSet
    assert(names.contains("extra_a") && names.contains("extra_b"),
      s"a concurrent evolution's column vanished from the recorded schema: $names")
    // And ALTER-style addColumns: concurrent same-name addition is a
    // metadata conflict, different names both land.
    TxnLog.addColumns(spark, t, Seq(
      org.apache.spark.sql.types.StructField("extra_c",
        org.apache.spark.sql.types.LongType)))
    intercept[IllegalArgumentException] {
      TxnLog.addColumns(spark, t, Seq(
        org.apache.spark.sql.types.StructField("EXTRA_C",
          org.apache.spark.sql.types.LongType)))
    }
  }

  test("concurrent appends: optimistic retry loses no commit and no rows") {
    val t = freshTable("race")
    TxnLog.create(spark, t, docs.limit(1))
    val perWriter = 5
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        (0 until perWriter).foreach { i =>
          TxnLog.append(spark, t,
            docs.filter(col("doc_id") % 2 === w && col("doc_id") % 7 === i))
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(TxnLog.latestVersion(spark, t) == 2L * perWriter,
      "every append must land at a distinct version")
    val expected = 1L + (0 until 2).map(w => (0 until perWriter).map(i =>
      docs.filter(col("doc_id") % 2 === w && col("doc_id") % 7 === i).count()).sum).sum
    assert(TxnLog.read(spark, t).count() == expected, "a racing append lost rows")
  }

  test("exactly-once sink: a replayed batch commits nothing, rows land once") {
    val t = freshTable("eos")
    val chunks = (0 until 3).map(i => docs.filter(col("doc_id") % 3 === i))
    TxnLog.create(spark, t, chunks(0))

    // The foreachBatch contract: after a failure the SAME batchId is
    // re-delivered; the sink must be idempotent on it.
    assert(TxnLog.appendBatch(spark, t, chunks(1), "streamA", 0L).isDefined)
    assert(TxnLog.appendBatch(spark, t, chunks(2), "streamA", 1L).isDefined)
    // Replays: same batch, any number of times, from a restarted query.
    assert(TxnLog.appendBatch(spark, t, chunks(2), "streamA", 1L).isEmpty)
    assert(TxnLog.appendBatch(spark, t, chunks(1), "streamA", 0L).isEmpty)

    assert(TxnLog.latestVersion(spark, t) == 2L,
      "replayed batches must not publish commits")
    assert(TxnLog.lastCommittedBatch(spark, t, "streamA").contains(1L))
    // A different stream's ids are independent.
    assert(TxnLog.lastCommittedBatch(spark, t, "streamB").isEmpty)
    assert(TxnLog.read(spark, t).count() == docs.count(),
      "rows must land exactly once across replays")

    // End-to-end through a real streaming query: every micro-batch
    // goes through the idempotent sink; a second identical query run
    // (fresh stream, fresh ids) uses its own stream id.
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val more = docs.filter(col("doc_id") % 3 === 0).limit(5)
      .collect().map(r => (r.getLong(0) + 1000000L, r.getString(1), r.getLong(2)))
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Long)]
    val q = source.toDF().toDF("doc_id", "lang", "n_chars")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        TxnLog.appendBatch(spark, t, batch, "streamB", batchId)
        // A sink-side retry inside the same epoch: must be a no-op.
        TxnLog.appendBatch(spark, t, batch, "streamB", batchId)
        ()
      }
      .start()
    try {
      source.addData(more.take(2).toSeq); q.processAllAvailable()
      source.addData(more.drop(2).toSeq); q.processAllAvailable()
    } finally q.stop()
    assert(TxnLog.read(spark, t).count() == docs.count() + more.length,
      "streamed rows must land exactly once despite the in-epoch retry")
  }

  test("ACID merge: delta replaces matched keys, inserts the rest, old version travels") {
    val t = freshTable("merge")
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 30))
    val preMerge = TxnLog.latestVersion(spark, t)
    val delta = docs.filter(col("doc_id") >= 10 && col("doc_id") < 40)
      .withColumn("n_chars", lit(-1L))
    TxnLog.merge(spark, t, delta, "doc_id")

    val now = TxnLog.read(spark, t)
    val expectedRows = docs.filter(col("doc_id") < 10).count() + delta.count()
    assert(now.count() == expectedRows,
      "merge must keep unmatched current rows + every delta row, nothing else")
    assert(now.filter(col("doc_id") >= 10 && col("n_chars") =!= -1L).count() == 0,
      "a matched key kept a pre-merge row")
    assert(now.filter(col("doc_id") < 10 && col("n_chars") === -1L).count() == 0,
      "an unmatched key was touched")
    // One atomic commit; the pre-merge table still time-travels.
    assert(TxnLog.latestVersion(spark, t) == preMerge + 1)
    assert(TxnLog.read(spark, t, Some(preMerge)).count() ==
      docs.filter(col("doc_id") < 30).count())
  }

  test("schema evolution: appended columns read as null for old files") {
    val t = freshTable("schema")
    TxnLog.create(spark, t, docs.select("doc_id", "lang"))
    TxnLog.append(spark, t,
      docs.select("doc_id", "lang").filter(col("doc_id") < 5)
        .withColumn("score", lit(7L)),
      mergeSchema = true)
    val now = TxnLog.read(spark, t)
    assert(now.columns.contains("score"), "appended column missing from merged schema")
    assert(now.filter(col("score") === 7L).count() ==
      docs.filter(col("doc_id") < 5).count())
    assert(now.filter(col("score").isNull).count() == docs.count(),
      "pre-evolution rows must read as null in the new column")
    // A pre-evolution snapshot still presents the old schema.
    assert(!TxnLog.read(spark, t, Some(0)).columns.contains("score"))
  }

  test("stats-in-log skipping: the pruned scan opens a strict subset " +
       "of files and answers exactly like the full filter") {
    val t = freshTable("skip")
    TxnLog.createWithStats(spark, t,
      docs.filter(col("n_chars") < 300).repartition(3), "n_chars")
    TxnLog.appendWithStats(spark, t,
      docs.filter(col("n_chars") >= 300).repartition(3), "n_chars")
    val pruned = TxnLog.readPruned(spark, t, "n_chars", 400L, Long.MaxValue)
    val full = TxnLog.read(spark, t).filter(col("n_chars") >= 400)
    assert(pruned.inputFiles.length < TxnLog.read(spark, t).inputFiles.length,
      "stats pruning did not drop any file from the scan")
    assert(pruned.collect().map(_.toSeq).toSet === full.collect().map(_.toSeq).toSet)
  }

  test("stats survive checkpointed replay; stats-less commits are " +
       "never pruned (mixed logs stay sound)") {
    val t = freshTable("skipckpt")
    TxnLog.createWithStats(spark, t,
      docs.filter(col("n_chars") < 300), "n_chars")
    // Push past a checkpoint boundary with stats-less appends of
    // high-n_chars rows: they must ALWAYS scan.
    (0 to TxnLog.CheckpointInterval).foreach { i =>
      TxnLog.append(spark, t,
        docs.filter(col("n_chars") >= 300 && col("doc_id") % (TxnLog.CheckpointInterval + 1) === i))
    }
    // And one more stats-carrying band AFTER the checkpoint.
    TxnLog.appendWithStats(spark, t,
      docs.filter(col("n_chars") < 200).withColumn("doc_id", col("doc_id") + 1000000L),
      "n_chars")
    val pruned = TxnLog.readPruned(spark, t, "n_chars", 300L, Long.MaxValue)
    val expected = TxnLog.read(spark, t).filter(col("n_chars") >= 300)
    // The create-band file (max < 300, stats from BEFORE the
    // checkpoint) and the post-checkpoint low band must both be
    // pruned; the stats-less middle scans in full.
    assert(pruned.inputFiles.length < TxnLog.read(spark, t).inputFiles.length)
    assert(pruned.collect().map(_.toSeq).toSet === expected.collect().map(_.toSeq).toSet)
  }

  test("readPruned on a column with no stats anywhere degrades to the " +
       "plain filtered read") {
    val t = freshTable("nostats")
    TxnLog.create(spark, t, docs)
    val pruned = TxnLog.readPruned(spark, t, "n_chars", 0L, 100L)
    assert(pruned.collect().map(_.toSeq).toSet ===
      TxnLog.read(spark, t).filter(col("n_chars").between(0, 100))
        .collect().map(_.toSeq).toSet)
  }

  test("deleteMoR masks rows without rewriting any data file; masks " +
       "are cumulative and time travel sees the pre-delete rows") {
    val t = freshTable("mor")
    TxnLog.create(spark, t, docs)
    val dataFiles0 = TxnLog.snapshot(spark, t).toSet
    val total = docs.count()

    val r1 = TxnLog.deleteMoR(spark, t, col("doc_id") % 10 === 0)
    assert(r1.isDefined)
    assert(TxnLog.snapshot(spark, t).toSet === dataFiles0,
      "MoR delete must not change the data file set")
    val after1 = TxnLog.read(spark, t)
    assert(after1.filter(col("doc_id") % 10 === 0).count() === 0)
    assert(after1.count() === docs.filter(col("doc_id") % 10 =!= 0).count())

    // Second mask folds into the first: both exclusions hold.
    TxnLog.deleteMoR(spark, t, col("doc_id") % 10 === 1)
    val after2 = TxnLog.read(spark, t)
    assert(after2.filter(col("doc_id") % 10 <= 1).count() === 0)
    assert(after2.count() === docs.filter(col("doc_id") % 10 > 1).count())

    // Pre-delete versions still resolve every row.
    assert(TxnLog.read(spark, t, Some(0)).count() === total)
    // No visible row matches → no commit.
    assert(TxnLog.deleteMoR(spark, t, col("doc_id") % 10 === 1).isEmpty)
  }

  test("compaction materializes deletion vectors; COW delete on a " +
       "masked table does not resurrect masked rows") {
    val t = freshTable("morcow")
    TxnLog.create(spark, t, docs)
    TxnLog.deleteMoR(spark, t, col("doc_id") % 4 === 0)
    // COW delete whose victims overlap masked files: survivors must
    // exclude BOTH populations.
    TxnLog.delete(spark, t, col("doc_id") % 4 === 1)
    val afterCow = TxnLog.read(spark, t)
    assert(afterCow.filter(col("doc_id") % 4 <= 1).count() === 0)
    assert(afterCow.count() === docs.filter(col("doc_id") % 4 > 1).count())

    TxnLog.compact(spark, t, targetFiles = 2)
    val snap = TxnLog.snapshotFull(spark, t)
    assert(snap.forall(_._2.dv.isEmpty), "compaction must clear DV bindings")
    assert(TxnLog.read(spark, t).count() === docs.filter(col("doc_id") % 4 > 1).count())
  }

  test("updateMoR: one commit masks matched rows and adds their " +
       "updated copies; stacks with MoR delete; time travel intact") {
    val t = freshTable("morupd")
    TxnLog.create(spark, t, docs)
    val filesBefore = TxnLog.snapshot(spark, t).toSet
    val r = TxnLog.updateMoR(spark, t, col("n_chars") > 400,
      Map("n_chars" -> (col("n_chars") + 10000L)))
    assert(r.isDefined)
    // Old data files untouched; only the updated copies were added.
    assert(filesBefore.subsetOf(TxnLog.snapshot(spark, t).toSet))
    val after = TxnLog.read(spark, t)
    assert(after.count() === docs.count(), "update must not change row count")
    assert(after.filter(col("n_chars") > 400 && col("n_chars") <= 10000).count() === 0,
      "matched rows must all carry the update")
    assert(after.filter(col("n_chars") > 10000).count() ===
      docs.filter(col("n_chars") > 400).count())
    // Stacks with a MoR delete on the POST-update state.
    TxnLog.deleteMoR(spark, t, col("n_chars") > 10000)
    assert(TxnLog.read(spark, t).count() ===
      docs.filter(col("n_chars") <= 400).count())
    // v0 still reads the original rows.
    assert(TxnLog.read(spark, t, Some(0))
      .agg(sum("n_chars")).head.getLong(0) ===
      docs.agg(sum("n_chars")).head.getLong(0))
    // No visible match → no commit.
    assert(TxnLog.updateMoR(spark, t, col("n_chars") > 10000,
      Map("n_chars" -> lit(0L))).isEmpty)
  }

  test("changes() reports MoR-deleted rows as deletes (a re-masked " +
       "file enters the diff though the file set is unchanged)") {
    val t = freshTable("morcdf")
    TxnLog.create(spark, t, docs)
    TxnLog.deleteMoR(spark, t, col("doc_id") % 5 === 0)
    val diff = TxnLog.changes(spark, t, 0L, TxnLog.latestVersion(spark, t))
    assert(diff.filter(col("_change") === "insert").count() === 0)
    assert(diff.filter(col("_change") === "delete").count() ===
      docs.filter(col("doc_id") % 5 === 0).count())
  }

  test("vacuum spares DV objects referenced by retained versions and " +
       "collects them once unreferenced") {
    val t = freshTable("morvac")
    TxnLog.create(spark, t, docs)
    TxnLog.deleteMoR(spark, t, col("doc_id") % 3 === 0)
    val expected = docs.filter(col("doc_id") % 3 =!= 0).count()
    // Retain everything: the DV must survive and the read stays masked.
    TxnLog.vacuum(spark, t, retainVersions = 10, retainMillis = 0L)
    assert(TxnLog.read(spark, t).count() === expected)
    // Compact (materializes), then retain only the compacted version:
    // fragments AND the now-unreferenced DV object go.
    TxnLog.compact(spark, t, targetFiles = 1)
    val dead = TxnLog.vacuum(spark, t, retainVersions = 1, retainMillis = 0L)
    assert(dead.nonEmpty)
    assert(TxnLog.read(spark, t).count() === expected)
  }

  test("readPruned applies deletion vectors on the kept files") {
    val t = freshTable("morprune")
    TxnLog.createWithStats(spark, t,
      docs.filter(col("n_chars") < 300).repartition(2), "n_chars")
    TxnLog.appendWithStats(spark, t,
      docs.filter(col("n_chars") >= 300).repartition(2), "n_chars")
    TxnLog.deleteMoR(spark, t, col("doc_id") % 2 === 0)
    val got = TxnLog.readPruned(spark, t, "n_chars", 300L, Long.MaxValue)
    val want = docs.filter(col("n_chars") >= 300 && col("doc_id") % 2 =!= 0)
    assert(got.count() === want.count())
    assert(got.inputFiles.length < TxnLog.read(spark, t).inputFiles.length)
  }

  test("merge pins its base and rebases past a concurrent commit " +
       "instead of dropping its rows") {
    import spark.implicits._
    val t = freshTable("mergerace")
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 10))
    val base = TxnLog.latestVersion(spark, t)
    // The race: another writer lands an append AFTER this merge pinned
    // its base but BEFORE its commit claims a slot.
    TxnLog.append(spark, t,
      Seq((100000L, "xx", 1L)).toDF("doc_id", "lang", "n_chars"))
    val delta = docs.filter(col("doc_id") < 3)
      .withColumn("n_chars", col("n_chars") + 5000L)
    // The stale attempt must abandon WITHOUT publishing …
    assert(TxnLog.mergeAttempt(spark, t, delta, "doc_id", base).isEmpty)
    assert(TxnLog.read(spark, t).filter(col("doc_id") === 100000L).count() === 1)
    // … and the public merge loop re-resolves: delta applied AND the
    // interloper's row survives.
    TxnLog.merge(spark, t, delta, key = "doc_id")
    val after = TxnLog.read(spark, t)
    assert(after.filter(col("doc_id") === 100000L).count() === 1,
      "merge dropped a concurrent append's rows")
    assert(after.filter(col("doc_id") < 3 && col("n_chars") > 5000).count() === 3)
    assert(after.count() === 11)
  }

  test("merge with stats on the key rewrites only key-range-touched " +
       "files; out-of-range deltas degenerate to pure inserts") {
    import spark.implicits._
    val t = freshTable("mergeprune")
    // Two key bands with stats on doc_id: [0,100) and [100,200).
    TxnLog.createWithStats(spark, t,
      docs.filter(col("doc_id") < 100).repartition(2), "doc_id")
    TxnLog.appendWithStats(spark, t,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200).repartition(2),
      "doc_id")
    val lowBand = TxnLog.snapshotFull(spark, t)
      .filter(_._2.stats.exists(_.cols.get("doc_id").exists(_.max < 100)))
    assert(lowBand.nonEmpty)
    val total = TxnLog.read(spark, t).count()

    // Delta keyed entirely in the high band: low-band files must keep
    // their paths AND their stats through the merge.
    val delta = docs.filter(col("doc_id") >= 150 && col("doc_id") < 160)
      .withColumn("n_chars", col("n_chars") + 7777L)
    TxnLog.merge(spark, t, delta, key = "doc_id")
    val after = TxnLog.snapshotFull(spark, t).toMap
    lowBand.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"pruned file $p was rewritten")
    }
    val merged = TxnLog.read(spark, t)
    assert(merged.count() === total)
    assert(merged.filter(col("n_chars") > 7777).count() ===
      docs.filter(col("doc_id") >= 150 && col("doc_id") < 160).count())
    // Low-band rows untouched.
    assert(merged.filter(col("doc_id") < 100).agg(sum("n_chars")).head.getLong(0) ===
      docs.filter(col("doc_id") < 100).agg(sum("n_chars")).head.getLong(0))

    // Delta wholly outside every band: NO file rewrites, pure insert.
    val before = TxnLog.snapshotFull(spark, t).toMap
    TxnLog.merge(spark, t,
      Seq((999999L, "zz", 1L)).toDF("doc_id", "lang", "n_chars"), key = "doc_id")
    val after2 = TxnLog.snapshotFull(spark, t).toMap
    before.foreach { case (p, st) =>
      assert(after2.get(p).contains(st), s"pure insert rewrote $p")
    }
    assert(TxnLog.read(spark, t).count() === total + 1)
  }

  test("merge pruning disables itself for keys without a long image " +
       "(a cast-null delta key must still replace its row)") {
    import spark.implicits._
    val t = freshTable("mergenullcast")
    // String keys; "abc" casts to null, so its row is invisible to the
    // stats range of its (mixed) file.
    TxnLog.createWithStats(spark, t,
      Seq(("1", 10L), ("2", 20L), ("abc", 30L)).toDF("id", "v").coalesce(1), "id")
    TxnLog.appendWithStats(spark, t,
      Seq(("100", 100L)).toDF("id", "v"), "id")
    // Delta range [5,5] is disjoint from the first file's stats [1,2] —
    // naive pruning would skip it and orphan "abc".
    TxnLog.merge(spark, t,
      Seq(("abc", 99L), ("5", 50L)).toDF("id", "v"), key = "id")
    val got = TxnLog.read(spark, t).as[(String, Long)].collect().toMap
    assert(got === Map("1" -> 10L, "2" -> 20L, "abc" -> 99L,
      "100" -> 100L, "5" -> 50L))
  }

  test("compactSmall rewrites only the fragment tail: large files keep " +
       "their paths and their DV bindings") {
    val t = freshTable("partial")
    // 6 fragment files of ~5 rows each + 1 big file of the rest.
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 30).repartition(6))
    TxnLog.append(spark, t, docs.filter(col("doc_id") >= 30).coalesce(1))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sizes = TxnLog.snapshot(spark, t)
      .map(p => p -> fs.getFileStatus(new org.apache.hadoop.fs.Path(t, p)).getLen)
    val big = sizes.maxBy(_._2)
    // Mask one row in a fragment and one in the big file.
    TxnLog.deleteMoR(spark, t, col("doc_id") === 2 || col("doc_id") === 40)
    val expected = docs.filter(col("doc_id") =!= 2 && col("doc_id") =!= 40).count()

    val r = TxnLog.compactSmall(spark, t, maxFileBytes = big._2, targetFiles = 2)
    assert(r.isDefined)
    val after = TxnLog.snapshotFull(spark, t)
    assert(after.exists(_._1 == big._1), "the large file must keep its path")
    assert(after.count(_._2.dv.isDefined) === 1 &&
      after.find(_._1 == big._1).get._2.dv.isDefined,
      "only the untouched large file should still carry a mask")
    assert(after.size < sizes.size)
    assert(TxnLog.read(spark, t).count() === expected)
    // Sub-threshold: fewer than two qualifying files → no commit.
    assert(TxnLog.compactSmall(spark, t, maxFileBytes = 1L, targetFiles = 1).isEmpty)
  }

  test("history: one audit row per commit with the derived operation") {
    import spark.implicits._
    val t = freshTable("history")
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 10))
    TxnLog.append(spark, t, docs.filter(col("doc_id") >= 10 && col("doc_id") < 20))
    TxnLog.appendBatch(spark, t, docs.filter(col("doc_id") === 20), "s1", 0L)
    TxnLog.deleteMoR(spark, t, col("doc_id") === 1)
    TxnLog.updateMoR(spark, t, col("doc_id") === 2, Map("n_chars" -> lit(7L)))
    TxnLog.compact(spark, t, targetFiles = 1)
    val h = TxnLog.history(spark, t)
      .select("version", "operation", "stream_txn")
      .as[(Long, String, String)].collect().toList
    assert(h.map(_._1) === List(5L, 4L, 3L, 2L, 1L, 0L), "newest first")
    assert(h.map(_._2) === List(
      "REWRITE (merge/compact/delete)", "UPDATE (merge-on-read)",
      "DELETE (merge-on-read)", "STREAMING APPEND", "APPEND", "CREATE"))
    assert(h.find(_._1 == 2L).get._3 === "s1:0")
  }

  test("clustered compaction bounds each output file's span on the " +
       "cluster key (stats-in-log shows the tiling)") {
    val t = freshTable("zcompact")
    TxnLog.createWithStats(spark, t, docs.repartition(6), "n_chars")
    val globalSpan = {
      val r = docs.agg(max("n_chars") - min("n_chars")).head.getLong(0)
      r
    }
    // Unclustered baseline: random placement → every file spans ~all.
    TxnLog.compact(spark, t, targetFiles = 4)
    val plainSpans = TxnLog.snapshotFull(spark, t)
      .flatMap(_._2.stats).flatMap(_.cols.get("n_chars")).map(s => s.max - s.min)
    // Clustered rewrite: range partition + local sort on n_chars.
    TxnLog.compact(spark, t, targetFiles = 4, clusterBy = Seq(col("n_chars")))
    val zSpans = TxnLog.snapshotFull(spark, t)
      .flatMap(_._2.stats).flatMap(_.cols.get("n_chars")).map(s => s.max - s.min)
    assert(zSpans.nonEmpty && plainSpans.nonEmpty)
    assert(zSpans.sum < globalSpan * 1.2,
      s"clustered spans should ~tile the range: $zSpans vs global $globalSpan")
    assert(zSpans.max < plainSpans.max,
      s"clustering must narrow the widest file: $zSpans vs $plainSpans")
    assert(TxnLog.read(spark, t).count() === docs.count())
  }

  test("checkpoints publish by rename: no torn c*.json is ever " +
       "visible, and a leftover .tmp is inert") {
    val t = freshTable("ckptatomic")
    TxnLog.create(spark, t, docs.filter(col("doc_id") === 0))
    (1 to TxnLog.CheckpointInterval).foreach { i =>
      TxnLog.append(spark, t, docs.filter(col("doc_id") === i))
    }
    val logP = new org.apache.hadoop.fs.Path(s"$t/_log")
    val fs = logP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(logP).map(_.getPath.getName)
    assert(names.exists(n => n.startsWith("c") && n.endsWith(".json")))
    assert(!names.exists(_.endsWith(".tmp")), "tmp leaked past the rename")
    // A crashed writer's torn temp (whatever garbage it holds) must
    // never affect resolution — only *.json names replay.
    val torn = new org.apache.hadoop.fs.Path(logP, "c00000099.json.tmp")
    val out = fs.create(torn, true)
    out.write("{\"adds\":[\"gar".getBytes("UTF-8")); out.close()
    assert(TxnLog.read(spark, t).count() ===
      docs.filter(col("doc_id") <= TxnLog.CheckpointInterval).count())
  }

  test("schema enforcement: a mistyped append fails the COMMIT, not a later read") {
    import spark.implicits._
    val t = freshTable("enforce")
    TxnLog.create(spark, t, docs)
    val before = TxnLog.latestVersion(spark, t)
    // Wrong type on an existing column: rejected loudly at commit time.
    val mistyped = docs.withColumn("n_chars", col("n_chars").cast("string"))
    val e1 = intercept[IllegalArgumentException] { TxnLog.append(spark, t, mistyped) }
    assert(e1.getMessage.contains("n_chars") && e1.getMessage.contains("rejected"))
    // Unknown column without the evolution opt-in: rejected.
    val e2 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, docs.withColumn("extra", lit(1L)))
    }
    assert(e2.getMessage.contains("mergeSchema"))
    // Nothing published, the table still reads clean.
    assert(TxnLog.latestVersion(spark, t) === before)
    assert(TxnLog.read(spark, t).count() === docs.count())
    // Case-insensitive names resolve to the same column (Spark
    // default) — probed with a STRING retype (an INT frame would now
    // be accepted as a lossless widening into the BIGINT column).
    val e3 = intercept[IllegalArgumentException] {
      TxnLog.append(spark, t, docs.withColumnRenamed("n_chars", "N_CHARS")
        .withColumn("N_CHARS", col("N_CHARS").cast("string")))
    }
    assert(e3.getMessage.contains("N_CHARS"))
    // ... and a genuinely narrower frame IS accepted in place: the
    // file stores INT32, readers promote to the table's BIGINT.
    TxnLog.append(spark, t, docs.limit(1)
      .withColumn("n_chars", col("n_chars").cast("int")))
    assert(TxnLog.read(spark, t).count() === docs.count() + 1)
    // The sanctioned evolution path still works and records the schema.
    TxnLog.append(spark, t, docs.withColumn("extra", lit(1L)), mergeSchema = true)
    assert(TxnLog.tableSchema(spark, t).exists(_.fieldNames.contains("extra")))
    // Streaming appends are enforced identically.
    val e4 = intercept[IllegalArgumentException] {
      TxnLog.appendBatch(spark, t, mistyped, "s9", 0L)
    }
    assert(e4.getMessage.contains("rejected"))
    // A SET expression that retypes a column fails updateMoR's commit.
    val e5 = intercept[IllegalArgumentException] {
      TxnLog.updateMoR(spark, t, col("doc_id") === 1,
        Map("n_chars" -> lit("oops")))
    }
    assert(e5.getMessage.contains("n_chars"))
    // merge enforces the delta's types too.
    intercept[IllegalArgumentException] {
      TxnLog.merge(spark, t, Seq(("1", "xx", 2L, 3L)).toDF(
        "doc_id", "lang", "n_chars", "extra"), key = "doc_id")
    }
  }

  test("multi-column stats: one commit carries several columns and " +
       "readPruned skips on any of them; stats survive checkpointed replay") {
    val t = freshTable("multistats")
    TxnLog.createWithStats(spark, t,
      docs.filter(col("doc_id") < 100).repartition(2),
      Seq("doc_id", "n_chars"))
    TxnLog.appendWithStats(spark, t,
      docs.filter(col("doc_id") >= 100).repartition(2),
      Seq("doc_id", "n_chars"))
    val allFiles = TxnLog.read(spark, t).inputFiles.length
    // Prune on the FIRST column…
    val byId = TxnLog.readPruned(spark, t, "doc_id", 0L, 99L)
    assert(byId.inputFiles.length < allFiles)
    assert(byId.count() === docs.filter(col("doc_id") < 100).count())
    // …and on the SECOND, from the same log entries.
    val lo = docs.filter(col("doc_id") < 100)
      .agg(max("n_chars")).head.getLong(0)
    val byChars = TxnLog.readPruned(spark, t, "n_chars", lo + 1, Long.MaxValue)
    assert(byChars.collect().map(_.toSeq).toSet ===
      TxnLog.read(spark, t).filter(col("n_chars") > lo)
        .collect().map(_.toSeq).toSet)
    // Push past a checkpoint: both columns' stats must survive replay.
    (1 to TxnLog.CheckpointInterval).foreach { i =>
      TxnLog.appendWithStats(spark, t,
        docs.filter(col("doc_id") % 17 === i).withColumn("doc_id",
          col("doc_id") + 10000L), Seq("doc_id", "n_chars"))
    }
    val afterCkpt = TxnLog.snapshotFull(spark, t)
    assert(afterCkpt.forall(_._2.stats.exists(st =>
      st.cols.contains("doc_id") && st.cols.contains("n_chars"))),
      "a checkpointed replay dropped a stats column")
    // A compaction's rewrite re-derives stats for BOTH inherited columns.
    TxnLog.compact(spark, t, targetFiles = 2)
    assert(TxnLog.snapshotFull(spark, t).forall(_._2.stats.exists(st =>
      st.cols.contains("doc_id") && st.cols.contains("n_chars"))))
  }

  test("wide delete degrades to a bounded full-snapshot rewrite: " +
       "no unbounded victim collect, same answer") {
    val t = freshTable("widedel")
    TxnLog.create(spark, t, docs.repartition(8))
    // Predicate touching every file, cap forced tiny: the fallback path.
    val r = TxnLog.delete(spark, t, col("doc_id") % 2 === 0,
      maxCollectedVictims = 2)
    assert(r.isDefined)
    assert(r.get.removed === 8, "the wide path must rewrite the whole snapshot")
    assert(TxnLog.read(spark, t).collect().map(_.getLong(0)).toSet ===
      docs.filter(col("doc_id") % 2 =!= 0).collect().map(_.getLong(0)).toSet)
    // Narrow delete on the same table still takes the pruned path.
    val ids = TxnLog.read(spark, t).select("doc_id").limit(1)
      .collect().map(_.getLong(0))
    val r2 = TxnLog.delete(spark, t, col("doc_id") === ids.head)
    assert(r2.isDefined && r2.get.removed < TxnLog.snapshot(spark, t).size + 1)
  }

  test("OPTIMIZE-vs-DML race: a compaction pinned before a MoR delete " +
       "abandons; the DML pinned before a compaction abandons — no row loss") {
    val t = freshTable("optrace")
    TxnLog.create(spark, t, docs.repartition(4))
    val expected = docs.filter(col("doc_id") % 10 =!= 0).count()

    // Race 1: compactor pins its base, then a MoR delete lands first.
    val base1 = TxnLog.latestVersion(spark, t)
    TxnLog.deleteMoR(spark, t, col("doc_id") % 10 === 0)
    assert(TxnLog.compactAttempt(spark, t, base1, targetFiles = 1).isEmpty,
      "a stale compaction must abandon, not resurrect masked rows")
    assert(TxnLog.read(spark, t).count() === expected)
    // The fresh compaction then materializes the mask.
    TxnLog.compact(spark, t, targetFiles = 1)
    assert(TxnLog.read(spark, t).count() === expected)
    assert(TxnLog.snapshotFull(spark, t).forall(_._2.dv.isEmpty))

    // Race 2: the MoR delete pins its base, then a compaction replaces
    // its victims — the pinned DML must abandon loudly (masking a
    // removed file would silently delete nothing).
    val base2 = TxnLog.latestVersion(spark, t)
    TxnLog.compact(spark, t, targetFiles = 2)
    val before = TxnLog.latestVersion(spark, t)
    intercept[IllegalStateException] {
      TxnLog.deleteMoRAt(spark, t, col("doc_id") % 10 === 1, base2)
    }
    assert(TxnLog.latestVersion(spark, t) === before,
      "the losing DML must publish nothing")
    assert(TxnLog.read(spark, t).count() === expected, "race lost rows")
    // Re-run at the tip: applies cleanly.
    assert(TxnLog.deleteMoR(spark, t, col("doc_id") % 10 === 1).isDefined)
    assert(TxnLog.read(spark, t).count() ===
      docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 1).count())
  }

  test("abandoned merge/compact attempts drop their staged files eagerly " +
       "and a bounded merge throws instead of livelocking") {
    val t = freshTable("eager")
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 10))
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stageDirs: Set[String] = fs.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath.getName).filter(_.startsWith("stage-")).toSet
    val live = stageDirs
    val base = TxnLog.latestVersion(spark, t)
    TxnLog.append(spark, t, docs.filter(col("doc_id") === 50))
    // Stale attempts abandon AND leave no new staged directory behind.
    assert(TxnLog.mergeAttempt(spark, t,
      docs.filter(col("doc_id") < 3), "doc_id", base).isEmpty)
    assert(TxnLog.compactAttempt(spark, t, base, targetFiles = 1).isEmpty)
    val leaked = stageDirs -- live --
      TxnLog.snapshot(spark, t).map(_.takeWhile(_ != '/')).toSet
    assert(leaked.isEmpty, s"abandoned attempts leaked staged dirs: $leaked")
    // merge() itself stays bounded: with maxAttempts = 0 equivalent
    // pressure (attempts exhausted), it surfaces the conflict.
    intercept[java.util.ConcurrentModificationException] {
      TxnLog.merge(spark, t, docs.filter(col("doc_id") < 2), "doc_id",
        maxAttempts = 0)
    }
  }

  test("threaded mixed DML: appends, merges, MoR deletes, and " +
       "compactions race freely — no lost or duplicated rows, every " +
       "conflict surfaces as the documented type and resolves on retry") {
    import spark.implicits._
    val t = freshTable("stress")
    TxnLog.create(spark, t,
      (-8L to -1L).map(i => (i, "init", 0L)).toDF("doc_id", "lang", "n_chars"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def guard(body: => Unit): Unit =
      try body catch { case e: Throwable => errors.add(e) }
    // Documented loser behavior: COW/compact abandons throw
    // IllegalStateException, merge exhaustion throws
    // ConcurrentModificationException — anything else is a bug.
    def retrying(n: Int)(body: => Unit): Unit = {
      var left = n
      var done = false
      while (!done && left > 0) {
        left -= 1
        try { body; done = true }
        catch {
          case _: IllegalStateException |
               _: java.util.ConcurrentModificationException if left > 0 => ()
        }
      }
      assert(done, "retries exhausted under stress")
    }
    val appender = new Thread(() => guard {
      (0 until 5).foreach { i =>
        TxnLog.append(spark, t,
          Seq((100L + i, "app", i.toLong)).toDF("doc_id", "lang", "n_chars"))
      }
    })
    val merger = new Thread(() => guard {
      (1 to 4).foreach { i =>
        TxnLog.merge(spark, t,
          Seq((1000L, "mrg", i.toLong), (1001L, "mrg", i * 10L))
            .toDF("doc_id", "lang", "n_chars"),
          key = "doc_id", maxAttempts = 500)
      }
    })
    val deleter = new Thread(() => guard {
      (-4L to -1L).foreach { id =>
        retrying(100) { TxnLog.deleteMoR(spark, t, col("doc_id") === id) }
      }
    })
    val compactor = new Thread(() => guard {
      (0 until 3).foreach { _ =>
        retrying(100) { TxnLog.compact(spark, t, targetFiles = 2) }
      }
    })
    val threads = Seq(appender, merger, deleter, compactor)
    threads.foreach(_.start()); threads.foreach(_.join(600000))
    assert(errors.isEmpty,
      s"undocumented failure under stress: ${errors.toArray.mkString("; ")}")
    val rows = TxnLog.read(spark, t).as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // Row conservation across every interleaving: surviving init rows,
    // every appended row, both merge keys — nothing else, no dupes
    // (the map build would hide dupes; count pins it).
    assert(TxnLog.read(spark, t).count() === rows.size, "duplicate doc_id")
    val expectedIds = (-8L to -5L).toSet ++ (100L to 104L) ++ Set(1000L, 1001L)
    assert(rows.keySet === expectedIds,
      s"row loss/resurrection: got ${rows.keySet.toSeq.sorted}")
    // The merger is sequential, so its keys end at its LAST merge.
    assert(rows(1000L) === (("mrg", 4L)) && rows(1001L) === (("mrg", 40L)))
    (100L to 104L).foreach(i => assert(rows(i) === (("app", i - 100L))))
    // Time travel still resolves the creation state exactly.
    assert(TxnLog.read(spark, t, Some(0L)).count() === 8)
  }

  test("ADOPT converts a plain parquet directory in place: zero data " +
       "movement, stats from the first read, full txn surface after") {
    val t = freshTable("adopt")
    docs.repartition(3).write.parquet(t) // a plain pre-existing dataset
    val filesBefore = {
      val p = new org.apache.hadoop.fs.Path(t)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(st => st.getPath.getName -> st.getModificationTime)
        .filter(_._1.endsWith(".parquet")).toMap
    }
    TxnLog.adopt(spark, t)
    // Zero movement: same files, untouched mtimes.
    val p = new org.apache.hadoop.fs.Path(t)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val after = fsys.listStatus(p).map(st =>
      st.getPath.getName -> st.getModificationTime)
      .filter(_._1.endsWith(".parquet")).toMap
    assert(after === filesBefore, "adoption must not touch data files")
    assert(TxnLog.read(spark, t).count() === docs.count())
    // Footer stats landed: a disjoint range prunes without scanning.
    assert(TxnLog.readPruned(spark, t, "doc_id", 10L, 12L).count() ===
      docs.filter(col("doc_id").between(10, 12)).count())
    // The full surface applies post-adoption.
    TxnLog.append(spark, t, docs.limit(3))
    assert(TxnLog.read(spark, t).count() === docs.count() + 3)
    assert(TxnLog.read(spark, t, Some(0L)).count() === docs.count())
    TxnLog.delete(spark, t, col("doc_id") === 1L)
    assert(TxnLog.read(spark, t).filter(col("doc_id") === 1L).count() === 0L)
    // Double adoption refuses; hive-partitioned layouts now ADOPT as
    // partitioned tables (TxnPartitionSpec owns that surface).
    intercept[IllegalArgumentException] { TxnLog.adopt(spark, t) }
    val part = freshTable("adoptpart")
    docs.write.partitionBy("lang").parquet(part)
    TxnLog.adopt(spark, part)
    assert(TxnLog.partitionColumns(spark, part) === Seq("lang"))
    assert(TxnLog.read(spark, part).count() === docs.count())
  }

  test("the full invariant stack composes on an ADOPTED table: " +
       "constraint + generated column + bloom + restore in sequence") {
    import spark.implicits._
    val t = freshTable("adoptstack")
    (0L until 100L).map(i => (i, i * 3L)).toDF("id", "n")
      .coalesce(2).write.parquet(t)
    TxnLog.adopt(spark, t)                                        // v0
    TxnLog.addConstraint(spark, t, "pos", "n >= 0")               // v1
    TxnLog.addGeneratedColumn(spark, t, "band", "n DIV 30")       // v2
    graft.sources.TxnBloom.writeConfig(spark, t, Seq("id"))
    TxnLog.indexBloom(spark, t)
    TxnLog.append(spark, t, Seq((100L, 300L)).toDF("id", "n"))    // v3
    assert(TxnLog.read(spark, t).filter(col("id") === 100L)
      .select("band").head().getLong(0) === 10L)
    intercept[Exception] {
      TxnLog.append(spark, t, Seq((101L, -1L)).toDF("id", "n"))
    }
    assert(TxnLog.readPrunedEq(spark, t, "id", Seq(42L, 100L))
      .count() === 2L)
    TxnLog.restore(spark, t, 0L)                                  // v4
    assert(TxnLog.read(spark, t).count() === 100L)
    assert(TxnLog.read(spark, t).columns.toSeq === Seq("id", "n"),
      "restore rolls the schema (and its metadata) back to v0")
  }

  test("optimize-write (opt-in REBALANCE staging) collapses a wide " +
       "writer's small-file spray; rows and stats intact") {
    val t = freshTable("optwrite")
    spark.conf.set("spark.graft.write.rebalance", "true")
    try {
      TxnLog.create(spark, t, docs.repartition(16))
      val files = TxnLog.snapshot(spark, t).size
      assert(files <= 2,
        s"REBALANCE staging should coalesce 16 writer tasks, got $files files")
      assert(TxnLog.read(spark, t).count() === docs.count())
      // Stats still recorded on the shaped output.
      assert(TxnLog.snapshotFull(spark, t).forall(_._2.stats.isDefined))
    } finally spark.conf.unset("spark.graft.write.rebalance")
  }

  test("overwriteWhere replaces EXACTLY the predicate region in one " +
       "atomic commit: non-matching rows in victim files survive, " +
       "escaping replacement rows are rejected, subquery predicates " +
       "refuse, and time travel keeps the pre-replace state") {
    import spark.implicits._
    val t = freshTable("rwhere")
    // Two files split by doc_id band so the predicate (on n_chars)
    // cross-cuts files — partially-matching files must rewrite their
    // survivors, not drop them.
    TxnLog.create(spark, t, docs.filter(col("doc_id") < 250).coalesce(1))
    TxnLog.append(spark, t, docs.filter(col("doc_id") >= 250).coalesce(1))
    val vPre = TxnLog.latestVersion(spark, t)
    val pred = col("n_chars") >= 400L
    val replacement = docs.filter(pred && col("doc_id") % 2 === 0)
      .withColumn("n_chars", col("n_chars") + 100000L)
    val r = TxnLog.overwriteWhere(spark, t, pred, replacement)
    assert(r.version === vPre + 1, "one atomic commit")
    val got = TxnLog.read(spark, t).as[(Long, String, Long)].collect().toSet
    val want = docs.filter(!pred).as[(Long, String, Long)].collect().toSet ++
      replacement.as[(Long, String, Long)].collect().toSet
    assert(got === want, "survivors + replacement, nothing else")
    // Time travel still serves the pre-replace region.
    assert(TxnLog.read(spark, t, Some(vPre)).filter(pred).count() ===
      docs.filter(pred).count())
    // The Delta contract: a replacement row OUTSIDE the predicate
    // region fails loudly before anything commits.
    val vNow = TxnLog.latestVersion(spark, t)
    intercept[IllegalArgumentException] {
      TxnLog.overwriteWhere(spark, t, col("n_chars") >= 500000L,
        Seq((1L, "xx", 7L)).toDF("doc_id", "lang", "n_chars"))
    }
    assert(TxnLog.latestVersion(spark, t) === vNow, "nothing committed")
    // Subquery predicates refuse with the remedy.
    docs.limit(3).createOrReplaceTempView("rw_dim")
    intercept[IllegalArgumentException] {
      TxnLog.overwriteWhere(spark, t,
        col("doc_id").isin() || expr("doc_id IN (SELECT doc_id FROM rw_dim)"),
        replacement)
    }
  }

  test("NULL-predicate rows SURVIVE delete and overwriteWhere (rows are " +
       "affected only where the predicate is TRUE), and a NULL-predicate " +
       "replacement row is an escapee — round-15 advice, high") {
    import spark.implicits._
    val t = freshTable("nullpred")
    // score is NULL for ids 3 and 7 — `score > 3` is NULL there, and
    // SQL DELETE/replaceWhere semantics must keep those rows.
    val rows = Seq((1L, Some(1L)), (2L, Some(5L)), (3L, None),
      (4L, Some(9L)), (7L, None)).toDF("id", "score")
    TxnLog.create(spark, t, rows.coalesce(1))
    val pred = col("score") > 3L
    // --- delete: only TRUE rows (2, 4) go; NULL rows (3, 7) survive.
    assert(TxnLog.delete(spark, t, pred).isDefined)
    assert(TxnLog.read(spark, t).select("id").as[Long].collect().toSet ===
      Set(1L, 3L, 7L), "null-predicate rows must survive DELETE")
    // --- overwriteWhere on a fresh copy: survivors = FALSE and NULL.
    val t2 = freshTable("nullpred2")
    TxnLog.create(spark, t2, rows.coalesce(1))
    TxnLog.overwriteWhere(spark, t2, pred,
      Seq((10L, Some(100L))).toDF("id", "score"))
    assert(TxnLog.read(spark, t2).select("id").as[Long].collect().toSet ===
      Set(1L, 3L, 7L, 10L),
      "replaceWhere must keep null-predicate rows and land the replacement")
    // --- contract check: a replacement row where the predicate is NULL
    // does NOT satisfy it — escapee, rejected before anything stages.
    val vNow = TxnLog.latestVersion(spark, t2)
    intercept[IllegalArgumentException] {
      TxnLog.overwriteWhere(spark, t2, pred,
        Seq((11L, None: Option[Long])).toDF("id", "score"))
    }
    assert(TxnLog.latestVersion(spark, t2) === vNow, "nothing committed")
  }

  test("snapshot resolution replays from the newest checkpoint") {
    val t = freshTable("ckpt")
    TxnLog.create(spark, t, docs.filter(col("doc_id") === 0))
    (1 to TxnLog.CheckpointInterval + 2).foreach { i =>
      TxnLog.append(spark, t, docs.filter(col("doc_id") === i))
    }
    val fs = new org.apache.hadoop.fs.Path(s"$t/_log")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(s"$t/_log"))
      .map(_.getPath.getName)
    assert(names.exists(_.startsWith("c")), "no checkpoint was written")
    val expected = docs.filter(col("doc_id") <= TxnLog.CheckpointInterval + 2).count()
    assert(TxnLog.read(spark, t).count() == expected)
  }
}
