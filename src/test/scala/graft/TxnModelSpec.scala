package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Model-based check of the transaction log's whole DML surface: a
  * seeded random program of append / overwrite / merge / COW-delete /
  * MoR-delete / MoR-update / compact / vacuum / RESTORE / log-cleanup /
  * replaceWhere / COPY INTO / external-loss-plus-FSCK runs against
  * BOTH the
  * real log and a driver-side reference model (a plain Map keyed by
  * id), and after EVERY op the table read must equal the model exactly.
  * Ops compose in ways the per-op specs never enumerate (update over a
  * mask over a compaction over a merge …); three seeds × a dozen ops
  * each walk a few thousand such interleavings across runs. Time
  * travel is checked against per-version model snapshots at the end.
  */
class TxnModelSpec extends AnyFunSuite with SparkSpec {

  private type Model = Map[Long, Long] // id -> v

  private def readTable(t: String): Map[Long, Long] =
    TxnLog.read(spark, t).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def df(m: Iterable[(Long, Long)]): DataFrame = {
    import spark.implicits._
    m.toSeq.toDF("id", "v").repartition(2)
  }

  private def runProgram(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = s"${sys.props("java.io.tmpdir")}/graft_txnmodel_${seed}_${System.nanoTime()}"
    var nextId = 100L
    val land = s"${t}_landing"
    new org.apache.hadoop.fs.Path(land)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new org.apache.hadoop.fs.Path(land))
    var model: Model = (0L until 20L).map(i => i -> i * 10).toMap
    TxnLog.create(spark, t, df(model))
    val versions = scala.collection.mutable.ArrayBuffer[(Long, Model)](
      (TxnLog.latestVersion(spark, t), model))

    for (step <- 1 to 12) {
      val op = rnd.nextInt(13)
      op match {
        case 0 => // append fresh ids
          val rows = (0 until 1 + rnd.nextInt(5)).map { _ =>
            nextId += 1; nextId -> rnd.nextLong(1000)
          }
          TxnLog.append(spark, t, df(rows))
          model = model ++ rows
        case 1 => // merge: update a random residue class, insert fresh
          val k = 2 + rnd.nextInt(3)
          val updates = model.keys.filter(_ % k == 0).map(id => id -> -id).toSeq
          val inserts = (0 until rnd.nextInt(3)).map { _ =>
            nextId += 1; nextId -> rnd.nextLong(1000)
          }
          val delta = updates ++ inserts
          if (delta.nonEmpty) {
            TxnLog.merge(spark, t, df(delta), key = "id")
            model = model ++ delta
          }
        case 2 => // COW delete a residue class
          val k = 2 + rnd.nextInt(4)
          TxnLog.delete(spark, t, col("id") % k === 1)
          model = model.filter { case (id, _) => id % k != 1 }
        case 3 => // MoR delete a residue class
          val k = 2 + rnd.nextInt(4)
          TxnLog.deleteMoR(spark, t, col("id") % k === 0)
          model = model.filter { case (id, _) => id % k != 0 }
        case 4 => // MoR update a residue class
          val k = 2 + rnd.nextInt(4)
          TxnLog.updateMoR(spark, t, col("id") % k === 1,
            Map("v" -> (col("v") + 7L)))
          model = model.map { case (id, v) =>
            if (id % k == 1) id -> (v + 7) else id -> v
          }
        case 5 => // a compaction flavor (all row-invisible)
          rnd.nextInt(3) match {
            case 0 => // full (materializes masks)
              TxnLog.compact(spark, t, targetFiles = 1 + rnd.nextInt(3))
            case 1 => // clustered rewrite
              TxnLog.compact(spark, t, targetFiles = 1 + rnd.nextInt(3),
                clusterBy = Seq(col("v")))
            case 2 => // partial: only the sub-threshold fragment tail
              TxnLog.compactSmall(spark, t, maxFileBytes = 16L * 1024,
                targetFiles = 1 + rnd.nextInt(2))
          }
        case 6 => // overwrite with a mapped copy of the current state
          val next = model.map { case (id, v) => id -> (v * 2) }
          TxnLog.overwrite(spark, t, df(next))
          model = next
        case 7 => // vacuum a random retention window (read-invisible)
          TxnLog.vacuum(spark, t, retainVersions = 1 + rnd.nextInt(5))
        case 8 => // RESTORE to a random recorded version; a target that
          // vacuum/cleanup made unreachable refuses loudly = a no-op.
          val (v, m) = versions(rnd.nextInt(versions.size))
          try {
            TxnLog.restore(spark, t, v)
            model = m
          } catch {
            case e: Exception if Option(e.getMessage).exists(msg =>
              msg.contains("vacuumed") || msg.contains("not in log")) => ()
          }
        case 9 => // log cleanup (tip-read-invisible)
          TxnLog.cleanupLog(spark, t, retainVersions = 1 + rnd.nextInt(5))
        case 10 => // replaceWhere: swap the v >= thr region for fresh
          // rows (all satisfying the predicate — the validated
          // contract); an empty replacement is a pure region delete.
          val thr = rnd.nextLong(1000)
          val rows = (0 until rnd.nextInt(4)).map { _ =>
            nextId += 1; nextId -> (thr + rnd.nextLong(500))
          }
          TxnLog.overwriteWhere(spark, t, col("v") >= thr, df(rows))
          model = model.filter(_._2 < thr) ++ rows
        case 11 => // COPY INTO: land an upload then copy, or re-run
          // idempotently. The ledger is MONOTONE across RESTORE by
          // design (a processed file stays processed — the Delta
          // contract), which this composition exercises: a restore
          // that rolls copied rows away must NOT see them resurrected
          // by a later copy.
          if (rnd.nextBoolean()) {
            val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
              nextId += 1; nextId -> rnd.nextLong(1000)
            }
            df(rows).coalesce(1).write.parquet(s"$land/u$step")
            val r = TxnLog.copyInto(spark, t, land)
            assert(r.loaded >= 1L, s"fresh upload must load (seed=$seed)")
            model = model ++ rows
          } else {
            assert(TxnLog.copyInto(spark, t, land).loaded === 0L,
              s"idempotent re-run must load nothing (seed=$seed)")
          }
        case 12 => // lose one live file EXTERNALLY, then FSCK REPAIR:
          // the model loses exactly the victim's LIVE rows (its
          // DV-masked rows are already absent from both sides).
          val full = TxnLog.snapshotFull(spark, t)
          val (victim, st) = full(rnd.nextInt(full.size))
          val liveRows = TxnLog.readState(spark, t, Seq(victim -> st))
            .select("id", "v").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          val vp = new org.apache.hadoop.fs.Path(t, victim)
          vp.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(vp, false)
          assert(TxnLog.fsck(spark, t) === Seq(victim))
          model = model.filter { case (id, v) =>
            !liveRows.get(id).contains(v)
          }
      }
      // Deletes can empty the table; the log read contract requires a
      // non-empty snapshot, so re-seed when a program empties it.
      if (model.isEmpty) {
        val rows = Seq({ nextId += 1; nextId -> 1L })
        TxnLog.append(spark, t, df(rows))
        model = model ++ rows
      }
      assert(readTable(t) === model,
        s"seed=$seed step=$step op=$op diverged from the model")
      if (op != 7 && op != 9) // vacuum/cleanup publish no version
        versions += ((TxnLog.latestVersion(spark, t), model))
    }

    // Time travel: every recorded (version, model) pair that vacuum's
    // physical deletion still resolves (retention windows were random,
    // so only assert versions whose files survived — the LAST recorded
    // pair always does).
    val (lastV, lastM) = versions.last
    assert(TxnLog.read(spark, t, Some(lastV)).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === lastM)
  }

  test("random DML programs: table state equals the reference model " +
       "after every op (seed 1)") { runProgram(1L) }

  test("random DML programs: table state equals the reference model " +
       "after every op (seed 2)") { runProgram(2L) }

  test("random DML programs: table state equals the reference model " +
       "after every op (seed 3)") { runProgram(3L) }
}
