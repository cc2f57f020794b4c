package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.LakeMaintenance
import graft.sources.{Tables, TxnLog}

/** Lake-maintenance band: the table-upkeep jobs a 100 TB corpus lake
  * runs between queries — small-file compaction, ANALYZE-style stats
  * collection, and stats-driven scan pruning. Each query runs the REAL
  * maintenance op end-to-end (write → maintain → read back) and returns
  * a result DuckDB can mirror from the source table, so the oracle gate
  * proves the op preserved/derived the data exactly; the file-layout
  * effects (counts, sizes, skipped directories) are pinned in LakeSpec,
  * which is where layout belongs — DuckDB cannot see files.
  */
object LakeQueries extends QueryModule {

  /** Per-run scratch root, keyed like q_partition_prune's so concurrent
    * Bench/Verify sessions never collide. */
  private def scratch(s: SparkSession, d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_lake_${s.sparkContext.applicationId}_${new java.io.File(d).getName}"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Small-file compaction. Plants the pathological layout a
    // per-micro-batch streaming sink produces (16 writer tasks ×
    // partitionBy → ~16 tiny files in every lang directory), then
    // compacts it with the REBALANCE-hint rewrite and reads the result
    // back for the oracle compare — so a compaction that drops,
    // duplicates, or re-partitions rows fails the hash, not just a
    // file-count eyeball. File-count/size assertions live in LakeSpec.
    "q_compact_files" -> ((s, d) => {
      val base = scratch(s, d)
      val frag = s"$base/frag"
      Tables.documents(s, d)
        .repartition(16, col("doc_id"))
        .write.mode("overwrite").partitionBy("lang").parquet(frag)
      LakeMaintenance.compact(s, frag, s"$base/compact", "lang",
        targetBytes = 8L * 1024 * 1024)
      s.read.parquet(s"$base/compact")
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"),
          max("doc_id").as("max_id"))
        .orderBy("lang")
    }),

    // ANALYZE: per-partition column statistics — row count, exact NDV,
    // min/max/sum, and the modal source value (skew detection) with a
    // deterministic lexicographic tie-break. One scan for the numeric
    // stats, one (lang,source)-grouped pass for the mode; both are
    // map-side-combined aggregations whose output is partition-count-
    // sized, so ANALYZE on a 100 TB table stays a metadata-cost job.
    "q_table_stats" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val stats = docs.groupBy("lang").agg(
        count(lit(1)).as("row_cnt"),
        countDistinct("source").as("ndv_source"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"),
        sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      val mode = docs.groupBy("lang", "source")
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("source"))))
        .filter(col("rn") === 1)
        .select(col("lang"), col("source").as("mode_source"))
      stats.join(broadcast(mode), "lang")
        .select("lang", "row_cnt", "ndv_source", "min_chars", "max_chars",
          "sum_chars", "min_id", "max_id", "mode_source")
        .orderBy("lang")
    }),

    // OPTIMIZE … ZORDER BY: the clustered-compaction rewrite — range
    // partition on (event_type, z) with the task count derived from
    // listed input bytes, local sort, partitioned write. The oracle
    // proves the rewrite moved every row and invented none; the
    // locality payoff (bounded per-file spans on BOTH z dimensions)
    // is LakeSpec's span-score pin, invisible to DuckDB by nature.
    "q_compact_cluster" -> ((s, d) => {
      val base = scratch(s, d)
      val ev = Tables.events(s, d)
      ev.repartition(16, col("event_id"))
        .write.mode("overwrite").partitionBy("event_type")
        .parquet(s"$base/evfrag")
      val uMax = ev.agg(max("user_id")).collect()(0).getLong(0)
      val z = graft.functions.ZOrder.zvalue(
        expr(s"user_id * 65535 DIV $uMax"),
        expr("((unix_micros(ts) DIV 60000000) % 1440) * 65535 DIV 1439"))
      LakeMaintenance.compact(s, s"$base/evfrag", s"$base/evz",
        "event_type", targetBytes = 4L * 1024 * 1024, clusterBy = Seq(z))
      s.read.parquet(s"$base/evz")
        .groupBy("event_type")
        .agg(count(lit(1)).as("row_cnt"),
          sum("user_id").as("sum_uid"),
          min("event_id").as("min_eid"),
          max("event_id").as("max_eid"))
        .orderBy("event_type")
    }),

    // Incremental ANALYZE: base write + collectStats, then a delta
    // appended through appendWithStats — the sidecar is merged from
    // the DELTA's stats alone (count adds, min/max widen), never by
    // rescanning the table. Returning the sidecar itself against a
    // DuckDB full-table GROUP BY is the sharpest possible oracle: the
    // incremental merge must land bit-equal to a from-scratch ANALYZE.
    "q_stats_incremental" -> ((s, d) => {
      val table = s"${scratch(s, d)}/incr"
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 3 =!= 0)
        .write.mode("overwrite").partitionBy("source").parquet(table)
      LakeMaintenance.collectStats(s, table, "source", "n_chars")
      LakeMaintenance.appendWithStats(s, table,
        docs.filter(col("doc_id") % 3 === 0), "source", "n_chars")
      s.read.parquet(s"$table/_stats").orderBy("source")
    }),

    // Versioned table + time travel: create v0 (even doc_ids), append
    // v1 (the rest), logically compact at v2 — then read BOTH v0 and
    // the post-compaction latest through the log in one result. The
    // oracle recomputes both populations from the source table, so it
    // proves (a) v0 stays exactly resolvable after two later commits
    // including a rewrite of every file, and (b) the compaction commit
    // preserved the full row set. Isolation/race/vacuum properties are
    // TxnLogSpec's.
    "q_time_travel" -> ((s, d) => {
      val table = s"${scratch(s, d)}/tt"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 2 === 0))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 =!= 0))
      TxnLog.compact(s, table, targetFiles = 4)
      val v0 = TxnLog.read(s, table, Some(0))
        .groupBy("lang").agg(count(lit(1)).as("rows_v0"))
      val now = TxnLog.read(s, table)
        .groupBy("lang").agg(count(lit(1)).as("rows_now"),
          sum("n_chars").as("sum_chars"))
      v0.join(now, "lang")
        .select("lang", "rows_v0", "rows_now", "sum_chars")
        .orderBy("lang")
    }),

    // ACID MERGE + row-level DELETE through the transaction log:
    // create the table minus a residue-class of docs, merge a delta
    // that UPDATES every 7th doc (n_chars + 1000) and INSERTS the
    // held-out class, then DELETE a third residue class — three
    // atomic commits — and read the final state back. The oracle
    // recomputes the end state from the source table, so a merge that
    // drops/duplicates keys, resurrects deleted rows, or tears a
    // commit fails the hash. Race/abandon semantics are TxnLogSpec's.
    "q_txn_merge" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnmerge"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 5 =!= 4))
      val updates = docs
        .filter(col("doc_id") % 7 === 0 && col("doc_id") % 5 =!= 4)
        .withColumn("n_chars", col("n_chars") + 1000L)
      val inserts = docs.filter(col("doc_id") % 5 === 4)
      TxnLog.merge(s, table, updates.unionByName(inserts), key = "doc_id")
      TxnLog.delete(s, table, col("doc_id") % 9 === 0)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // Change-data-feed between versions: create (even docs), append
    // (odd docs), DELETE short docs, then ask the log for the NET
    // row-level changes v0 → latest. The diff reads only churned
    // files (files live in both snapshots cancel by identity); the
    // oracle derives the same insert/delete populations from the
    // source table, proving the netting — appended-then-deleted rows
    // must vanish, surviving appends tag insert, dead creates delete.
    "q_txn_changes" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txncdf"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 2 === 0))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 =!= 0))
      TxnLog.delete(s, table, col("n_chars") < 300L)
      TxnLog.changes(s, table, 0L, TxnLog.latestVersion(s, table))
        .groupBy("_change", "lang")
        .agg(count(lit(1)).as("row_cnt"), sum("doc_id").as("sum_id"))
        .orderBy("_change", "lang")
    }),

    // The CDC TVF surface: the SAME net-changes diff as q_txn_changes,
    // consumed as SQL TEXT through the table_changes(...) table-valued
    // function (the Delta-style CDC front door) — grouping, filtering,
    // and joining over the TVF run through the ordinary analyzer. The
    // TVF registration/arity mechanics are GraftSqlDmlSpec's.
    "q_txn_changes_sql" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txncdfsql"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 2 === 0))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 =!= 0))
      TxnLog.delete(s, table, col("n_chars") < 300L)
      s.sql(s"""SELECT _change, lang, count(*) AS row_cnt,
               |  sum(doc_id) AS sum_id
               |FROM table_changes('$table', 0,
               |  ${TxnLog.latestVersion(s, table)})
               |GROUP BY _change, lang
               |ORDER BY _change, lang""".stripMargin)
    }),

    // Merge-on-read DELETE via deletion vectors: two cumulative masks
    // land as commits that rewrite NO data file (write cost ∝ deleted
    // rows — the needle-delete shape at 100 TB), and the read-side
    // anti-join must make them exactly invisible. The oracle
    // recomputes the surviving population from the source table; the
    // no-rewrite/cumulative-fold/materialize-on-compact mechanics are
    // TxnLogSpec's.
    "q_txn_delete_mor" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnmor"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs)
      TxnLog.deleteMoR(s, table, col("n_chars") < 250L)
      TxnLog.deleteMoR(s, table, col("doc_id") % 13 === 0)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // Merge-on-read UPDATE: one commit masks the matched rows and adds
    // their rewritten copies — write cost ∝ matched rows. Stacked with
    // a MoR delete on an UNRELATED predicate (doc_id class) so the
    // oracle composes without ordering ambiguity; the oracle recomputes
    // the end state with a CASE expression over the source table.
    "q_txn_update_mor" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnupd"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs)
      TxnLog.updateMoR(s, table, col("n_chars") > 400L,
        Map("n_chars" -> (col("n_chars") + 10000L)))
      TxnLog.deleteMoR(s, table, col("doc_id") % 7 === 0)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // Partial compaction: plant a fragment tail (16-way split) behind
    // one right-sized file, compact ONLY the sub-threshold fragments,
    // and read the table back — the oracle proves the maintenance op
    // moved every row and invented none; the large file keeping its
    // path (and masks surviving) is TxnLogSpec's.
    "q_txn_compact_small" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnsmall"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 4 === 0).coalesce(1))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 4 =!= 0).repartition(16))
      TxnLog.compactSmall(s, table,
        maxFileBytes = 512L * 1024, targetFiles = 2)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // Stats-in-log data skipping: three appends land n_chars-banded
    // files with per-file [min,max] recorded IN the commit entries,
    // and a range read prunes non-intersecting files from the listing
    // BEFORE any footer opens — the Delta §4.2 design. The oracle is
    // the plain filter; TxnLogSpec pins that the pruned scan's
    // inputFiles are a strict subset.
    "q_txn_skip" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnskip"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.createWithStats(s, table,
        docs.filter(col("n_chars") < 300L).repartition(4), "n_chars")
      TxnLog.appendWithStats(s, table,
        docs.filter(col("n_chars") >= 300L && col("n_chars") < 450L)
          .repartition(4), "n_chars")
      TxnLog.appendWithStats(s, table,
        docs.filter(col("n_chars") >= 450L).repartition(4), "n_chars")
      TxnLog.readPruned(s, table, "n_chars", lo = 460L, hi = Long.MaxValue)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // The SQL front door, end to end: every DML verb as SQL TEXT over
    // the DSv2 catalog — INSERT (V1 write), MoR UPDATE (parser
    // intercept + deletion vectors), COW DELETE on the masked table,
    // MERGE upsert, then the final state read back through a SQL scan
    // that must apply the surviving masks. The oracle recomposes the
    // same four steps as one CASE expression over the source table, so
    // any verb tearing, double-applying, or resurrecting rows fails
    // the hash. (Shape/isolation mechanics live in GraftSqlDmlSpec.)
    "q_txn_sql_dml" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/dmlns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 5 =!= 4))
      s.conf.set("spark.sql.catalog.gdml",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdml.root", base)
      docs.createOrReplaceTempView("gdml_src")
      s.sql("""INSERT INTO gdml.dmlns.docs
              |SELECT doc_id, lang, n_chars FROM gdml_src
              |WHERE doc_id % 5 = 4""".stripMargin)
      s.sql("""UPDATE gdml.dmlns.docs SET n_chars = n_chars + 1000
              |WHERE doc_id % 7 = 0""".stripMargin)
      s.sql("DELETE FROM gdml.dmlns.docs WHERE doc_id % 9 = 0")
      s.sql("""MERGE INTO gdml.dmlns.docs t
              |USING (SELECT doc_id, lang, CAST(0 AS BIGINT) AS n_chars
              |       FROM gdml_src WHERE doc_id % 11 = 0) u
              |ON t.doc_id = u.doc_id
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("""SELECT lang, count(*) AS row_cnt,
              |  sum(n_chars) AS sum_chars, sum(doc_id) AS sum_id
              |FROM gdml.dmlns.docs GROUP BY lang ORDER BY lang""".stripMargin)
    }),

    // SQL DELETE with an IN-subquery condition — the decontamination
    // shape (purge every document whose id appears in a benchmark/
    // blocklist table) and the single most common delete in a GDPR
    // pipeline. The blocklist is a SECOND txn table resolved through
    // the catalog INSIDE the subquery; the log's delete derives
    // survivors from the positive match set (anti-join on physical
    // row identity), so no negated-subquery rewrite limitation
    // applies. The oracle recomputes the surviving population with
    // the same NOT IN; file-prune/row-identity mechanics are
    // GraftSqlDmlSpec's.
    "q_txn_sql_decon" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/deconns/docs"
      val block = s"$base/deconns/blocklist"
      for (t <- Seq(table, block)) {
        val p = new org.apache.hadoop.fs.Path(t)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs)
      TxnLog.create(s, block, docs
        .filter(col("doc_id") % 17 === 0 || col("n_chars") < 220L)
        .select("doc_id"))
      s.conf.set("spark.sql.catalog.gdecon",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdecon.root", base)
      s.sql("""DELETE FROM gdecon.deconns.docs
              |WHERE doc_id IN (SELECT doc_id FROM gdecon.deconns.blocklist)"""
        .stripMargin)
      s.sql("""SELECT lang, count(*) AS row_cnt,
              |  sum(n_chars) AS sum_chars, sum(doc_id) AS sum_id
              |FROM gdecon.deconns.docs GROUP BY lang ORDER BY lang"""
        .stripMargin)
    }),

    // Clause-form SQL MERGE: conditional WHEN MATCHED DELETE/UPDATE,
    // a column-listed partial source (no lang column — star would be
    // illegal here), and WHEN NOT MATCHED BY SOURCE — the full
    // standard surface beyond the replace-by-key upsert, in ONE
    // atomic commit. The oracle recomposes the clause semantics as a
    // CASE over the source table; cardinality/ambiguity/isolation
    // mechanics are GraftSqlDmlSpec's.
    "q_txn_sql_merge_clauses" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/gmns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs)
      s.conf.set("spark.sql.catalog.gmrg",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gmrg.root", base)
      docs.createOrReplaceTempView("gmrg_src")
      s.sql("""MERGE INTO gmrg.gmns.docs t
              |USING (SELECT doc_id, n_chars FROM gmrg_src
              |       WHERE doc_id % 3 = 0) u
              |ON t.doc_id = u.doc_id
              |WHEN MATCHED AND u.n_chars < 300 THEN DELETE
              |WHEN MATCHED THEN UPDATE SET n_chars = t.n_chars + u.n_chars
              |WHEN NOT MATCHED BY SOURCE AND t.n_chars < 250
              |  THEN UPDATE SET n_chars = 0""".stripMargin)
      s.sql("""SELECT lang, count(*) AS row_cnt,
              |  sum(n_chars) AS sum_chars, sum(doc_id) AS sum_id
              |FROM gmrg.gmns.docs GROUP BY lang ORDER BY lang"""
        .stripMargin)
    }),

    // Column mapping end to end, all through SQL: RENAME COLUMN (pure
    // metadata — the physical slot stays, reads translate at scan
    // time), MoR UPDATE binding the RENAMED name in both SET and
    // WHERE, DROP COLUMN (slot retires), re-ADD of the dropped name
    // (fresh slot — old data must NOT resurrect, so pre-drop rows
    // read null), INSERT under the post-ALTER shape, and a final SQL
    // scan that must translate physical→logical on every file
    // generation. The oracle recomposes the same pipeline from the
    // source table; slot/retirement mechanics are ColumnMappingSpec's.
    "q_txn_column_map" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/cmns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs)
      s.conf.set("spark.sql.catalog.gcm",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gcm.root", base)
      s.conf.set("spark.sql.catalog.gcm.writable", "true")
      docs.createOrReplaceTempView("gcm_src")
      s.sql("ALTER TABLE gcm.cmns.docs RENAME COLUMN n_chars TO chars")
      s.sql("""UPDATE gcm.cmns.docs SET chars = chars + 1000
              |WHERE doc_id % 7 = 0""".stripMargin)
      s.sql("ALTER TABLE gcm.cmns.docs DROP COLUMN lang")
      s.sql("ALTER TABLE gcm.cmns.docs ADD COLUMNS (lang STRING)")
      s.sql("""INSERT INTO gcm.cmns.docs
              |SELECT doc_id + 1000000, n_chars, lang FROM gcm_src
              |WHERE doc_id % 13 = 0""".stripMargin)
      s.sql("""SELECT coalesce(lang, '_') AS lang2, count(*) AS row_cnt,
              |  sum(chars) AS sum_chars, sum(doc_id) AS sum_id
              |FROM gcm.cmns.docs GROUP BY 1 ORDER BY 1""".stripMargin)
    }),

    // Multi-column stats-in-log: ONE set of commits records per-file
    // [min,max] for BOTH doc_id and n_chars, and the same log entries
    // serve a prune on either column — the Delta shape where skipping
    // binds to any stat column, not a single declared key. The result
    // unions a doc_id-banded prune (aligned with the file layout) and
    // an n_chars prune (the second column); the oracle is the two
    // plain filters. File-subset pinning is TxnLogSpec's.
    "q_txn_skip2" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnskip2"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.createWithStats(s, table,
        docs.filter(col("doc_id") < 100L).repartition(3),
        Seq("doc_id", "n_chars"))
      TxnLog.appendWithStats(s, table,
        docs.filter(col("doc_id") >= 100L).repartition(3),
        Seq("doc_id", "n_chars"))
      val byId = TxnLog.readPruned(s, table, "doc_id", 0L, 99L)
        .withColumn("via", lit("id"))
      val byChars = TxnLog.readPruned(s, table, "n_chars", 460L, Long.MaxValue)
        .withColumn("via", lit("chars"))
      byId.unionByName(byChars)
        .select("via", "doc_id", "lang", "n_chars")
        .orderBy("via", "doc_id")
    }),

    // STRING data skipping through the default typed stats: three
    // lang-banded commits record string [min,max] per file WITHOUT any
    // opt-in (the Delta always-on convention), and a BETWEEN range read
    // prunes non-intersecting files in UTF-8 byte order before any
    // footer opens. The oracle is the plain string filter; the
    // file-subset and kind-mismatch soundness pins are TxnStatsSpec's.
    "q_txn_skip_str" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnskipstr"
      val p = new org.apache.hadoop.fs.Path(table)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("lang") < "es").repartition(3))
      TxnLog.append(s, table,
        docs.filter(col("lang") >= "es" && col("lang") < "m").repartition(3))
      TxnLog.append(s, table, docs.filter(col("lang") >= "m").repartition(3))
      TxnLog.readPrunedString(s, table, "lang", "es", "zz")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    // SQL maintenance front door: the fragmented table is compacted by
    // an `OPTIMIZE ... TARGET ... CLUSTER BY` STATEMENT (the parser
    // extension — Spark's grammar has no production for it) and the
    // superseded fragments swept by SQL `VACUUM`, then the post-
    // maintenance table must still be exactly the source rows. The
    // statement plumbing (laziness under EXPLAIN, RETAIN semantics,
    // clustered sort order, swept-path report) is GraftSqlDmlSpec's.
    "q_txn_sql_optimize" -> ((s, d) => {
      val table = s"${scratch(s, d)}/sqlopt"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table,
        docs.filter(col("doc_id") % 3 === 0).repartition(4))
      TxnLog.append(s, table,
        docs.filter(col("doc_id") % 3 === 1).repartition(4))
      TxnLog.append(s, table,
        docs.filter(col("doc_id") % 3 === 2).repartition(4))
      s.sql(s"OPTIMIZE '$table' TARGET 2 FILES CLUSTER BY (lang, doc_id)")
        .collect()
      s.conf.set("spark.graft.vacuum.retainMillis", "0")
      try s.sql(s"VACUUM '$table'").collect()
      finally s.conf.unset("spark.graft.vacuum.retainMillis")
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // PARTITIONED txn table lifecycle: hive-laid create + append,
    // partition-equality PRUNED read (tier-0: file list filtered on
    // the path-carried values before stats), and the O(1) metadata
    // partition DROP (retention's shape at 100 TB — a day of a 100 TB
    // table leaves the snapshot without a byte moving). The oracle
    // recomposes both reads from the source table, so a drop that
    // misses files, a prune that drops rows, or a partition value
    // mangled in the path round-trip all fail the hash. Layout and
    // metadata-only mechanics are TxnPartitionSpec's.
    "q_txn_partition" -> ((s, d) => {
      val table = s"${scratch(s, d)}/parted"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      TxnLog.createPartitioned(s, table,
        docs.filter(col("doc_id") % 2 === 0).repartition(2), Seq("lang"))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 =!= 0).repartition(2))
      TxnLog.dropPartition(s, table, "lang", "en")
      TxnLog.readPrunedPartition(s, table, "lang", Seq("de", "fr"))
        .withColumn("via", lit("prune"))
        .unionByName(TxnLog.read(s, table).withColumn("via", lit("full")))
        .groupBy("via", "lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("via", "lang")
    }),

    // Catalog-NAME-addressed maintenance: the same lifecycle as
    // q_txn_sql_optimize but every verb — ADD CONSTRAINT, OPTIMIZE,
    // RESTORE, VACUUM — addresses the table as `<catalog>.<ns>.<tbl>`
    // (the form real SQL users write; the parser resolves the
    // identifier through the registered GraftCatalog to the txn dir).
    // The post-maintenance table must still be exactly the source
    // rows; name-resolution mechanics and failure modes are
    // GraftSqlDmlSpec's.
    "q_txn_sql_named" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/named/sqlnamed"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.lakeq", "graft.sources.GraftCatalog")
      s.conf.set("spark.sql.catalog.lakeq.root", base)
      s.conf.set("spark.sql.catalog.lakeq.writable", "true")
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table,
        docs.filter(col("doc_id") % 3 === 0).repartition(4))         // v0
      TxnLog.append(s, table,
        docs.filter(col("doc_id") % 3 === 1).repartition(4))         // v1
      TxnLog.append(s, table,
        docs.filter(col("doc_id") % 3 === 2).repartition(4))         // v2
      s.sql("ALTER TABLE lakeq.named.sqlnamed ADD CONSTRAINT " +
        "chars_nonneg CHECK (n_chars >= 0)")                         // v3
      s.sql("OPTIMIZE lakeq.named.sqlnamed TARGET 2 FILES " +
        "CLUSTER BY (lang, doc_id)").collect()                       // v4
      s.sql("RESTORE lakeq.named.sqlnamed VERSION AS OF 2").collect() // v5
      s.conf.set("spark.graft.vacuum.retainMillis", "0")
      try s.sql("VACUUM lakeq.named.sqlnamed").collect()
      finally s.conf.unset("spark.graft.vacuum.retainMillis")
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // NULL-existence skipping: a sparse optional column (null for
    // English docs) banded so one commit's files are ALL-null and the
    // other's dense — IS NOT NULL readers prune the all-null files,
    // IS NULL audits prune the dense ones, both from the footer-
    // sourced null counts in the log (no file opens). The oracle is
    // the plain null-split; file-subset and sentinel mechanics are
    // TxnStatsSpec's.
    "q_txn_skip_null" -> ((s, d) => {
      val table = s"${scratch(s, d)}/skipnull"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("optional", expr("nullif(lang, 'en')"))
      TxnLog.create(s, table,
        docs.filter(col("lang") === "en").repartition(2))
      TxnLog.append(s, table,
        docs.filter(col("lang") =!= "en").repartition(2))
      TxnLog.readPrunedNull(s, table, "optional", isNull = false)
        .withColumn("via", lit("notnull"))
        .unionByName(TxnLog.readPrunedNull(s, table, "optional",
          isNull = true).withColumn("via", lit("isnull")))
        .groupBy("via")
        .agg(count(lit(1)).as("row_cnt"), sum("doc_id").as("sum_id"),
          sum("n_chars").as("sum_chars"))
        .orderBy("via")
    }),

    // ADOPT: a pre-existing PLAIN parquet dataset becomes a txn table
    // in place (zero data movement — the 100 TB migration story), then
    // the full surface applies: an append lands as v1 and a stats-
    // pruned range read serves from the adopted files' footer stats.
    // The oracle recomposes from the source; zero-movement/mtime/
    // refusal mechanics are TxnLogSpec's.
    "q_txn_adopt" -> ((s, d) => {
      val table = s"${scratch(s, d)}/adopted"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      docs.filter(col("doc_id") % 2 === 0).repartition(3).write.parquet(table)
      TxnLog.adopt(s, table)
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 1))
      TxnLog.readPruned(s, table, "n_chars", 460L, Long.MaxValue)
        .withColumn("via", lit("hi"))
        .unionByName(TxnLog.read(s, table)
          .filter(col("n_chars") < 460L).withColumn("via", lit("lo")))
        .groupBy("via", "lang")
        .agg(count(lit(1)).as("row_cnt"), sum("doc_id").as("sum_id"))
        .orderBy("via", "lang")
    }),

    // GENERATED column: added mid-history through SQL, so the table
    // carries all three populations the semantics define — rows from
    // BEFORE the addition (derived value null), rows written WITHOUT
    // the column (computed inside the staged write), and rows written
    // WITH a bogus value (recomputed — never writer-owned). The
    // oracle recomposes the same split from the source table; the
    // write-path mechanics are GeneratedColumnSpec's.
    "q_txn_generated" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/gnns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 3 === 0))
      s.sql(s"ALTER TABLE '$table' ADD GENERATED COLUMN size_band " +
        "AS (n_chars DIV 100)")
      TxnLog.append(s, table, docs.filter(col("doc_id") % 3 === 1))
      TxnLog.append(s, table,
        docs.filter(col("doc_id") % 3 === 2)
          .withColumn("size_band", lit(-999L))) // bogus: must be recomputed
      TxnLog.read(s, table)
        .groupBy(coalesce(col("size_band"), lit(-1L)).as("size_band"))
        .agg(count(lit(1)).as("row_cnt"), sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("size_band")
    }),

    // RESTORE: the table takes real damage through SQL (a DELETE
    // removing every third row) and is rolled back by a RESTORE
    // STATEMENT to the pre-delete version — one metadata-only commit
    // re-publishing that snapshot's files/stats/schema. The oracle is
    // the full source recompose: a restore that loses or duplicates a
    // single row fails the hash. DV re-binding, schema rollback, and
    // vacuumed-target refusal are GraftSqlDmlSpec's.
    "q_txn_restore" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/rstns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 2 === 0))  // v0
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 1))  // v1
      s.conf.set("spark.sql.catalog.grst",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grst.root", base)
      s.conf.set("spark.sql.catalog.grst.writable", "true")
      s.sql("DELETE FROM grst.rstns.docs WHERE doc_id % 3 = 0")      // v2
      s.sql(s"RESTORE '$table' TO VERSION AS OF 1").collect()        // v3
      s.sql("""SELECT lang, count(*) AS row_cnt, sum(n_chars) AS sum_chars,
              |  sum(doc_id) AS sum_id
              |FROM grst.rstns.docs GROUP BY lang ORDER BY lang""".stripMargin)
    }),

    // CHECK constraints: the ingest quality gate — a constraint is
    // added through SQL, valid writes land, and a VIOLATING insert is
    // attempted and must FAIL (the query throws if it somehow lands:
    // the final count recomputes from the table, so a leaked bad row
    // breaks the hash). Write-path mechanics (MoR update violations,
    // checkpoint survival, rename refusal) are ConstraintSpec's.
    "q_txn_constraint" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/ckns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.filter(col("doc_id") % 2 === 0))
      s.sql(s"ALTER TABLE '$table' ADD CONSTRAINT chars_ok " +
        "CHECK (n_chars >= 0 AND doc_id >= 0)")
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 1))
      val violated =
        try {
          TxnLog.append(s, table,
            docs.filter(col("doc_id") % 97 === 0)
              .withColumn("n_chars", lit(-1L)))
          false
        } catch { case _: Exception => true }
      require(violated, "the violating append must fail the write")
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("lang")
    }),

    // BLOOM-index point lookup: four residue-banded commits give every
    // file the FULL doc_id range (min/max stats intersect any probe —
    // range skipping is structurally useless here, the high-cardinality
    // unsorted-key shape), and the per-file bloom sidecars written by
    // createWithBloom/appendWithBloom are the only metadata that can
    // prune. The probe ids are all ≡ 1 (mod 4), so only one commit's
    // files survive the driver-side bloom screen; the oracle is the
    // plain IN filter — pruning must be answer-invisible at any SF.
    // Kept-file mechanics (subset size, no false negatives, vacuum
    // sweep) are BloomIndexSpec's.
    "q_txn_bloom_skip" -> ((s, d) => {
      val table = s"${scratch(s, d)}/txnbloom"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      TxnLog.createWithBloom(s, table,
        docs.filter(pmod(col("doc_id"), lit(4)) === 0).repartition(2),
        Seq("doc_id"))
      (1 to 3).foreach { r =>
        TxnLog.appendWithBloom(s, table,
          docs.filter(pmod(col("doc_id"), lit(4)) === r).repartition(2),
          Seq("doc_id"))
      }
      TxnLog.readPrunedEq(s, table, "doc_id", bloomProbeIds)
        .orderBy("doc_id")
    }),

    // The SAME point-lookup through the SQL FRONT DOOR: the bloom-scan
    // resolution rule re-plans `WHERE doc_id IN (...)` over the file
    // subset the sidecar index keeps (plan-shape pin in
    // GraftSqlDmlSpec); result must equal the plain IN filter.
    "q_txn_bloom_sql" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/blns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      TxnLog.createWithBloom(s, table,
        docs.filter(pmod(col("doc_id"), lit(4)) === 0).repartition(2),
        Seq("doc_id"))
      (1 to 3).foreach { r =>
        TxnLog.appendWithBloom(s, table,
          docs.filter(pmod(col("doc_id"), lit(4)) === r).repartition(2),
          Seq("doc_id"))
      }
      s.conf.set("spark.sql.catalog.gbl",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gbl.root", base)
      s.sql(s"""SELECT doc_id, lang, source, n_chars FROM gbl.blns.docs
               | WHERE doc_id IN (${bloomProbeIds.mkString(",")})
               | ORDER BY doc_id""".stripMargin)
    }),

    // The SQL face of stats-range skipping: value-banded commits (each
    // band's files carry tight [min,max] on n_chars), then a plain SQL
    // range WHERE over the catalog table — the scan rule folds the
    // conjuncts to [lo,hi] and prunes the file list through the log
    // stats at plan time, exactly like the API's readPruned. The
    // residual filter stays, so the oracle (the plain range filter)
    // must hash-match; the scanned-file-subset pin is
    // GraftSqlDmlSpec's.
    "q_txn_range_sql" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/rng/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table,
        docs.filter(col("n_chars") < 300).repartition(2))
      TxnLog.append(s, table,
        docs.filter(col("n_chars") >= 300 && col("n_chars") < 450)
          .repartition(2))
      TxnLog.append(s, table,
        docs.filter(col("n_chars") >= 450).repartition(2))
      s.conf.set("spark.sql.catalog.grng",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grng.root", base)
      s.sql("""SELECT doc_id, lang, n_chars FROM grng.rng.docs
              | WHERE n_chars BETWEEN 460 AND 5000
              | ORDER BY doc_id""".stripMargin)
    }),

    // The SEMI-JOIN face of the bloom point lookup: the probe list is
    // an IN-SUBQUERY over a small dim (the deleted-ids / sampled-docs
    // lookup shape) instead of literals. The scan rule evaluates the
    // capped subquery once at plan time and file-prunes through the
    // same two metadata tiers; the original InSubquery filter stays on
    // top, so the answer is the plain semi-join's by construction —
    // which is exactly what the oracle checks. Plan-shape (file
    // subset, dim-too-big bailout) is GraftSqlDmlSpec's.
    "q_txn_bloom_semijoin" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/blsj/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars")
      TxnLog.createWithBloom(s, table,
        docs.filter(pmod(col("doc_id"), lit(4)) === 0).repartition(2),
        Seq("doc_id"))
      (1 to 3).foreach { r =>
        TxnLog.appendWithBloom(s, table,
          docs.filter(pmod(col("doc_id"), lit(4)) === r).repartition(2),
          Seq("doc_id"))
      }
      s.conf.set("spark.sql.catalog.gbsj",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gbsj.root", base)
      s.sql(s"""SELECT doc_id, lang, source, n_chars FROM gbsj.blsj.docs
               | WHERE doc_id IN (SELECT doc_id
               |   FROM parquet.`$d/documents.parquet`
               |   WHERE doc_id % 499 = 0)
               | ORDER BY doc_id""".stripMargin)
    }),

    // STATIC-partition INSERT, end to end: partitioned create, an
    // `INSERT INTO … PARTITION (lang='en')` append, the daily-rebuild
    // primitive `INSERT OVERWRITE … PARTITION (lang='en')` (atomic
    // single-partition replace — Delta replaceWhere / Spark static
    // partition overwrite semantics), and a partition-scoped
    // `OPTIMIZE … PARTITION … CLUSTER BY` rewrite of the hot
    // partition. The oracle replays the replace: en must be exactly
    // the final recompute, the other partitions exactly the original
    // create — a leaked pre-overwrite row, a lost partition, or a
    // compaction that churns rows all fail the hash. Statement
    // mechanics (layout, refusals) are GraftSqlDmlSpec's.
    "q_txn_insert_partition" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/insp/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars")
      TxnLog.createPartitioned(s, table,
        docs.filter(col("doc_id") % 2 === 0).repartition(2), Seq("lang"))
      s.conf.set("spark.sql.catalog.gip",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gip.root", base)
      docs.createOrReplaceTempView("gip_src")
      s.sql("""INSERT INTO gip.insp.docs PARTITION (lang = 'en')
              |SELECT doc_id, source, n_chars FROM gip_src
              |WHERE lang = 'en' AND doc_id % 2 = 1""".stripMargin)
      s.sql("""INSERT OVERWRITE gip.insp.docs PARTITION (lang = 'en')
              |SELECT doc_id, source, n_chars FROM gip_src
              |WHERE lang = 'en' AND n_chars >= 300""".stripMargin)
      s.sql("OPTIMIZE gip.insp.docs PARTITION (lang = 'en') " +
        "TARGET 1 FILES CLUSTER BY (doc_id)").collect()
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // DYNAMIC partition overwrite + predicate retention: one
    // `INSERT OVERWRITE … PARTITION (lang)` replaces EXACTLY the
    // partitions the query produces (de and fr, recomputed with a
    // +100000 shift so leaked old rows are arithmetic-visible) in one
    // atomic commit while en/es/zh never move — then
    // `ALTER TABLE … DROP PARTITION WHERE lang >= 'zh'` drops the zh
    // partition through the typed-tuple predicate (the retention
    // idiom) as one metadata commit. The oracle recomposes the three
    // populations; empty-frame/atomicity mechanics are
    // TxnPartitionSpec's, statement mechanics GraftSqlDmlSpec's.
    "q_txn_insert_dynamic" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/insd/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d)
        .select("doc_id", "lang", "source", "n_chars")
      TxnLog.createPartitioned(s, table, docs.repartition(2), Seq("lang"))
      s.conf.set("spark.sql.catalog.gid",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gid.root", base)
      docs.createOrReplaceTempView("gid_src")
      s.sql("""INSERT OVERWRITE gid.insd.docs PARTITION (lang)
              |SELECT doc_id, lang, source, n_chars + 100000 FROM gid_src
              |WHERE lang IN ('de', 'fr') AND doc_id % 3 = 0""".stripMargin)
      s.sql("ALTER TABLE gid.insd.docs DROP PARTITION WHERE lang >= 'zh'")
        .collect()
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // Column DEFAULT values: declared at CREATE (`score BIGINT
    // DEFAULT 777`), filled by BOTH front doors — the graft API append
    // omitting the column (stage computes it in) and a SQL
    // column-list INSERT (Spark's own default resolution, admitted by
    // the catalog capability and the schema-carried metadata). The
    // oracle recomposes the populations with the literal; the
    // explicit-NULL/DEFAULT-keyword/ALTER-refusal mechanics are
    // GraftSqlDmlSpec's.
    "q_txn_default" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/defns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.gdef",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdef.root", base)
      s.conf.set("spark.sql.catalog.gdef.writable", "true")
      s.sql("""CREATE TABLE gdef.defns.docs (doc_id BIGINT, lang STRING,
              |  score BIGINT DEFAULT 777)""".stripMargin)
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      TxnLog.append(s, table, docs) // score omitted -> default fills
      docs.createOrReplaceTempView("gdef_src")
      s.sql("""INSERT INTO gdef.defns.docs (doc_id, lang)
              |SELECT doc_id + 1000000, lang FROM gdef_src
              |WHERE doc_id % 7 = 0""".stripMargin)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("score").as("sum_score"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // IDENTITY column — engine-assigned surrogate keys: `rid BIGINT
    // GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 3)`,
    // two appends that never supply the column (the log-carried
    // watermark allocates and advances inside each commit). WHICH row
    // gets WHICH id is engine-owned, so the oracle checks the
    // closed-form invariants instead: n distinct values forming
    // exactly the arithmetic sequence (min/max/sum in closed form
    // over the corpus count). Uniqueness under concurrent appenders,
    // ALWAYS/BY DEFAULT policies, and RESTORE watermark rollback are
    // GraftSqlDmlSpec's.
    "q_txn_identity" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/idns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.gidn",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gidn.root", base)
      s.conf.set("spark.sql.catalog.gidn.writable", "true")
      s.sql("""CREATE TABLE gidn.idns.docs (
              |  rid BIGINT GENERATED ALWAYS AS IDENTITY
              |    (START WITH 10 INCREMENT BY 3),
              |  doc_id BIGINT, lang STRING)""".stripMargin)
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 0))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 1))
      TxnLog.read(s, table).agg(
        count(lit(1)).as("row_cnt"),
        countDistinct(col("rid")).as("id_ndv"),
        min("rid").as("min_id"),
        max("rid").as("max_id"),
        sum("rid").as("sum_rid"),
        sum("doc_id").as("sum_doc"))
    }),

    // Schema evolution WITH a default (round-15 verdict): `ALTER
    // TABLE … ADD COLUMNS (score BIGINT DEFAULT 777)` on a table with
    // existing files. Pre-add rows read the frozen EXISTS_DEFAULT
    // (their files physically lack the column; Spark's parquet reader
    // fills schema-carried exists-defaults per file), a post-add
    // write OMITTING the column materializes the CURRENT_DEFAULT, and
    // a post-add write carrying explicit values keeps them. The
    // oracle recomposes the three populations with the literal.
    "q_txn_default_evolve" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/devns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.gdev",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gdev.root", base)
      s.conf.set("spark.sql.catalog.gdev.writable", "true")
      s.sql("CREATE TABLE gdev.devns.docs (doc_id BIGINT, lang STRING)")
      val docs = Tables.documents(s, d)
      TxnLog.append(s, table, docs.select("doc_id", "lang")) // pre-add files
      s.sql("ALTER TABLE gdev.devns.docs " +
        "ADD COLUMNS (score BIGINT DEFAULT 777)")
      TxnLog.append(s, table, docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang")))
      TxnLog.append(s, table, docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("lang"),
          col("n_chars").as("score")))
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("score").as("sum_score"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // TYPE WIDENING (round-15 verdict): INT data lands, `ALTER TABLE
    // … ALTER COLUMN n_chars TYPE BIGINT` widens as a pure metadata
    // commit, then a BIGINT append carries values past Int.MaxValue.
    // Old files keep their INT32 encoding (readers promote per file),
    // log stats stay canonical-long across the mix so the closing
    // range scan still prunes, and the oracle recomposes both
    // populations. Refuse-lossy and narrow-writer acceptance are
    // GraftSqlDmlSpec's.
    "q_txn_widen" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/wns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.gwid",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gwid.root", base)
      s.conf.set("spark.sql.catalog.gwid.writable", "true")
      s.sql("CREATE TABLE gwid.wns.docs (doc_id BIGINT, lang STRING, " +
        "n_chars INT)")
      val docs = Tables.documents(s, d)
      TxnLog.append(s, table, docs.select(col("doc_id"), col("lang"),
        col("n_chars").cast("int").as("n_chars")))
      s.sql("ALTER TABLE gwid.wns.docs ALTER COLUMN n_chars TYPE BIGINT")
      TxnLog.append(s, table, docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
          (col("n_chars") + 3000000000L).as("n_chars")))
      TxnLog.read(s, table).filter(col("n_chars") >= 400L)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // SYNC IDENTITY oracle-gated (round-15 verdict): GENERATED BY
    // DEFAULT identity, an engine-assigned batch (1..nA), EXPLICIT
    // high inserts (1000000 + doc_id — the standard contract leaves
    // the watermark behind them), `ALTER TABLE … SYNC IDENTITY`
    // realigning the watermark past the observed maximum from LOG
    // STATS alone, then a second engine batch that must continue
    // collision-free from there. WHICH row takes WHICH id is
    // engine-owned; the SEQUENCE is closed-form, so the oracle checks
    // count/ndv/min/max/sum invariants computed from the corpus.
    "q_txn_identity_sync" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/idsy/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.gids",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gids.root", base)
      s.conf.set("spark.sql.catalog.gids.writable", "true")
      s.sql("""CREATE TABLE gids.idsy.docs (
              |  rid BIGINT GENERATED BY DEFAULT AS IDENTITY,
              |  doc_id BIGINT, lang STRING)""".stripMargin)
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      // Engine batch A: rid omitted -> assigned 1..nA.
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 0))
      // Explicit high inserts: BY DEFAULT keeps writer values and
      // does NOT advance the watermark past them.
      TxnLog.append(s, table, docs.filter(col("doc_id") % 97 === 0)
        .withColumn("rid", col("doc_id") + 1000000L)
        .select("rid", "doc_id", "lang"))
      // The repair: realign the watermark past every existing value.
      s.sql("ALTER TABLE gids.idsy.docs SYNC IDENTITY").collect()
      // Engine batch B: continues from (1000000 + max_explicit) + 1.
      TxnLog.append(s, table, docs.filter(col("doc_id") % 2 === 1))
      TxnLog.read(s, table).agg(
        count(lit(1)).as("row_cnt"),
        countDistinct(col("rid")).as("id_ndv"),
        min("rid").as("min_id"),
        max("rid").as("max_id"),
        sum("rid").as("sum_rid"),
        sum("doc_id").as("sum_doc"))
    }),

    // CLUSTER BY as a TABLE PROPERTY (liquid-clustering style): the
    // keys are declared ONCE at CREATE, three residue-sliced appends
    // land files that each span the full n_chars range (range
    // skipping structurally useless), and a bare `OPTIMIZE` — no
    // CLUSTER BY clause — range-clusters on the recorded keys so the
    // closing range query prunes through the log stats. The oracle is
    // the plain range filter; property mechanics (recorded keys,
    // explicit-clause override, pruned-file pin) are
    // GraftSqlDmlSpec's.
    "q_txn_cluster_sql" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/clns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.gcl",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gcl.root", base)
      s.conf.set("spark.sql.catalog.gcl.writable", "true")
      s.sql("""CREATE TABLE gcl.clns.docs (doc_id BIGINT, lang STRING,
              |  n_chars BIGINT) CLUSTER BY (n_chars)""".stripMargin)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      (0 to 2).foreach { r =>
        TxnLog.append(s, table,
          docs.filter(col("doc_id") % 3 === r).repartition(2))
      }
      s.sql("OPTIMIZE gcl.clns.docs TARGET 3 FILES").collect()
      s.sql("""SELECT doc_id, lang, n_chars FROM gcl.clns.docs
              | WHERE n_chars BETWEEN 460 AND 5000
              | ORDER BY doc_id""".stripMargin)
    }),

    // GENERATED partition column — derived partitioning end to end:
    // `CREATE TABLE … (band BIGINT GENERATED ALWAYS AS (n_chars DIV
    // 100)) PARTITIONED BY (band)`, a write that NEVER supplies the
    // column (the engine derives it inside the staged write and lays
    // out hive-style), tier-0 pruning on the derived value, and the
    // O(1) metadata drop of one derived band. The oracle recomputes
    // the derivation in DuckDB; recompute/refusal mechanics are
    // GraftSqlDmlSpec's.
    "q_txn_gen_partition" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/gpns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      s.conf.set("spark.sql.catalog.ggp",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.ggp.root", base)
      s.conf.set("spark.sql.catalog.ggp.writable", "true")
      s.sql("""CREATE TABLE ggp.gpns.docs (doc_id BIGINT, lang STRING,
              |  n_chars BIGINT,
              |  band BIGINT GENERATED ALWAYS AS (n_chars DIV 100))
              |PARTITIONED BY (band)""".stripMargin)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.append(s, table, docs) // band derived, never supplied
      TxnLog.dropPartition(s, table, "band", 2L)
      TxnLog.readPrunedPartition(s, table, "band", Seq(4L, 5L))
        .withColumn("via", lit("prune"))
        .unionByName(TxnLog.read(s, table).withColumn("via", lit("full")))
        .groupBy("via", "band")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("via", "band")
    }),

    // PREDICATE overwrite — Delta's replaceWhere as a STATEMENT
    // (`INSERT INTO … REPLACE WHERE <cond> <query>`, a grammar OSS
    // Spark lacks): one atomic commit replaces exactly the predicate
    // region (long docs) with a recompute whose rows are VALIDATED to
    // satisfy the predicate; rows outside the region — including
    // non-matching rows in partially-matching files — must survive
    // the copy-on-write untouched. The oracle recomposes the two
    // populations; contract/refusal/concurrency mechanics are
    // TxnLogSpec's and GraftSqlDmlSpec's.
    "q_txn_replace_where" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/rwns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.repartition(3))
      s.conf.set("spark.sql.catalog.grw",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.grw.root", base)
      docs.createOrReplaceTempView("grw_src")
      s.sql("""INSERT INTO grw.rwns.docs REPLACE WHERE n_chars >= 400
              |SELECT doc_id, lang, n_chars + 100000 FROM grw_src
              |WHERE n_chars >= 400 AND doc_id % 2 = 0""".stripMargin)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // Decontamination-shaped replaceWhere (round-15 verdict #5): the
    // predicate is `doc_id IN (SELECT … contaminated ids …)` — the
    // engine materializes the subquery ONCE under a row cap into a
    // literal IN-list (TxnLog.materializeInSubqueries), so the
    // survivor negation, escapee validation, and stats-based victim
    // pruning all operate on an ordinary predicate. One atomic
    // commit: contaminated docs are replaced by their scrubbed
    // even-id twins (odd-id contaminated docs simply disappear —
    // replacement may cover any subset of the region). Driven through
    // the API here because this session is extension-free by design
    // (Spark's own INSERT INTO … REPLACE WHERE production refuses
    // subquery conditions); the graft SQL statement form of the same
    // subquery replace is spec-gated in GraftSqlDmlSpec.
    "q_txn_replace_decon" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/rdns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.repartition(3))
      docs.createOrReplaceTempView("grd_src")
      TxnLog.overwriteWhere(s, table,
        expr("doc_id IN (SELECT doc_id FROM grd_src WHERE n_chars % 7 = 0)"),
        docs.filter("n_chars % 7 = 0 AND doc_id % 2 = 0")
          .withColumn("n_chars", lit(0L)))
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // SHALLOW CLONE lifecycle (round-15 verdict #6): clone a table
    // zero-copy (version-0 commit referencing the source's files in
    // place), then DIVERGE both sides — the clone drops one region
    // and appends scrubbed rows, the source deletes a different
    // region — and read source, clone, and the clone's own v0 (time
    // travel on the two logs is independent by construction). The
    // physical contracts (no data copied, copy-on-write localization,
    // vacuum isolation, DV/partition-segment encoding) are pinned in
    // CloneSpec; this query oracle-gates the VISIBLE semantics.
    // FSCK REPAIR: lose one partition's data files OUTSIDE the engine
    // (deterministic loss — the whole lang=de slice), repair, and read
    // what survives. The oracle is the source table minus the lost
    // partition: repair must drop exactly the dead references and
    // nothing else. Scan-breakage, dry-run, and DV composition are
    // FsckSpec's.
    "q_txn_fsck" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/fsck/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.createPartitioned(s, table, docs, Seq("lang"))
      TxnLog.snapshot(s, table).filter(_.contains("lang=de")).foreach(rel =>
        fsys.delete(new org.apache.hadoop.fs.Path(table, rel), false))
      TxnLog.fsck(s, table)
      TxnLog.read(s, table)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    // MERGE WITH SCHEMA EVOLUTION, clause form: the target starts
    // WITHOUT n_chars; the merge adds it in its own commit, a
    // conditional UPDATE fills it on the qualifying matches, a DELETE
    // clause removes the rest of the matches, and every untouched row
    // reads the evolved column as NULL (additive-evolution read). The
    // clause/star/refusal matrix is pinned in MergeEvolveSpec.
    "q_txn_merge_evolve" -> ((s, d) => {
      val base = scratch(s, d)
      val table = s"$base/mevns/docs"
      val p = new org.apache.hadoop.fs.Path(table)
      val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fsys.exists(p)) fsys.delete(p, true)
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, table, docs.select("doc_id", "lang"))
      s.conf.set("spark.sql.catalog.mev",
        classOf[graft.sources.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.mev.root", base)
      docs.createOrReplaceTempView("mev_src")
      s.sql("""MERGE WITH SCHEMA EVOLUTION INTO mev.mevns.docs t
              |USING (SELECT doc_id, n_chars FROM mev_src
              |       WHERE doc_id % 4 = 0) u
              |ON t.doc_id = u.doc_id
              |WHEN MATCHED AND u.n_chars >= 500
              |  THEN UPDATE SET n_chars = u.n_chars
              |WHEN MATCHED THEN DELETE""".stripMargin)
      s.sql("""SELECT lang, count(*) AS row_cnt,
              |  coalesce(sum(n_chars), 0) AS sum_chars,
              |  sum(doc_id) AS sum_id
              |FROM mev.mevns.docs GROUP BY lang ORDER BY lang"""
        .stripMargin)
    }),

    // COPY INTO lifecycle: three "uploads" land in a plain parquet
    // landing zone; the first COPY ingests the two already-landed
    // batches, a re-run ingests NOTHING (the ledger), the third lands
    // and an incremental COPY picks up only it. The aggregate equals
    // the plain documents table exactly — any duplicate (broken
    // ledger) or miss (broken listing) fails the hash. Ledger
    // survival across checkpoints/cleanup and the FORCE/PATTERN/csv
    // faces are pinned in CopyIntoSpec.
    "q_txn_copy_into" -> ((s, d) => {
      val base = scratch(s, d)
      val land = s"$base/cpy/landing"
      val tbl = s"$base/cpy/tbl"
      Seq(land, tbl).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(t)
        val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fsys.exists(p)) fsys.delete(p, true)
      }
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      docs.filter(col("doc_id") % 3 === 0).write.parquet(s"$land/u1")
      docs.filter(col("doc_id") % 3 === 1).write.parquet(s"$land/u2")
      TxnLog.create(s, tbl, docs.limit(0))
      TxnLog.copyInto(s, tbl, land)
      TxnLog.copyInto(s, tbl, land) // idempotent: loads nothing
      docs.filter(col("doc_id") % 3 === 2).write.parquet(s"$land/u3")
      TxnLog.copyInto(s, tbl, land) // incremental: loads only u3
      TxnLog.read(s, tbl)
        .groupBy("lang")
        .agg(count(lit(1)).as("row_cnt"),
          sum("n_chars").as("sum_chars"),
          sum("doc_id").as("sum_id"))
        .orderBy("lang")
    }),

    "q_txn_clone" -> ((s, d) => {
      val base = scratch(s, d)
      val src = s"$base/clns/src"
      val dst = s"$base/clns/dup"
      Seq(src, dst).foreach { t =>
        val p = new org.apache.hadoop.fs.Path(t)
        val fsys = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fsys.exists(p)) fsys.delete(p, true)
      }
      val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
      TxnLog.create(s, src, docs.repartition(3))
      TxnLog.clone(s, src, dst)
      TxnLog.delete(s, dst, col("lang") === "en")
      TxnLog.append(s, dst,
        docs.filter(col("lang") === "en").withColumn("n_chars", lit(0L)))
      TxnLog.delete(s, src, col("doc_id") % 3 === 0)
      def agg(df: DataFrame, tag: String): DataFrame =
        df.groupBy("lang")
          .agg(count(lit(1)).as("row_cnt"),
            sum("n_chars").as("sum_chars"),
            sum("doc_id").as("sum_id"))
          .withColumn("via", lit(tag))
      agg(TxnLog.read(s, src), "src")
        .unionByName(agg(TxnLog.read(s, dst), "clone"))
        .unionByName(agg(TxnLog.read(s, dst, Some(0)), "clone_v0"))
        .select("via", "lang", "row_cnt", "sum_chars", "sum_id")
        .orderBy("via", "lang")
    }),

    // Stats-driven data skipping: write the table partitioned by
    // source, ANALYZE n_chars into the _stats sidecar, then answer a
    // high-end range query through the sidecar — partitions whose
    // [min,max] excludes the range are pruned from the file listing at
    // plan time (LakeSpec pins that the skipped directories are absent
    // from the scan). The oracle is the plain filter over the source
    // table: skipping must be invisible in the answer at any SF.
    "q_stats_prune" -> ((s, d) => {
      val table = s"${scratch(s, d)}/bysource"
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("source").parquet(table)
      LakeMaintenance.collectStats(s, table, "source", "n_chars")
      LakeMaintenance.prunedScan(s, table, "source", "n_chars",
          lo = 520L, hi = Long.MaxValue)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    })
  )

  /** All ≡ 1 (mod 4): one residue band's files hold every hit. */
  private val bloomProbeIds: Seq[Any] =
    Seq(1L, 5L, 9L, 13L, 17L, 29L, 57L, 101L, 201L, 401L)

  def oracle: Map[String, String] = Map(
    "q_txn_skip_null" ->
      """SELECT CASE WHEN lang = 'en' THEN 'isnull' ELSE 'notnull' END AS via,
        |  count(*) AS row_cnt, sum(doc_id)::BIGINT AS sum_id,
        |  sum(n_chars)::BIGINT AS sum_chars
        | FROM documents GROUP BY 1 ORDER BY via"""
        .stripMargin.replace("\n", ""),

    "q_txn_adopt" ->
      """SELECT CASE WHEN n_chars >= 460 THEN 'hi' ELSE 'lo' END AS via,
        |  lang, count(*) AS row_cnt, sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1, 2 ORDER BY via, lang"""
        .stripMargin.replace("\n", ""),

    "q_txn_generated" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN -1
        |   ELSE n_chars // 100 END AS size_band,
        |  count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1 ORDER BY size_band"""
        .stripMargin.replace("\n", ""),

    "q_txn_constraint" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_restore" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_sql_optimize" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_sql_named" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_partition" ->
      """SELECT * FROM (
        |  SELECT 'prune' AS via, lang, count(*) AS row_cnt,
        |    sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_id
        |   FROM documents WHERE lang IN ('de', 'fr') GROUP BY 2
        |  UNION ALL
        |  SELECT 'full' AS via, lang, count(*) AS row_cnt,
        |    sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_id
        |   FROM documents WHERE lang <> 'en' GROUP BY 2)
        | ORDER BY via, lang""".stripMargin.replace("\n", ""),

    "q_txn_insert_partition" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents
        | WHERE (lang = 'en' AND n_chars >= 300)
        |    OR (lang <> 'en' AND doc_id % 2 = 0)
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_default" ->
      """WITH allr AS (
        |  SELECT doc_id, lang FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang FROM documents WHERE doc_id % 7 = 0)
        |SELECT lang, count(*) AS row_cnt,
        |  (777 * count(*))::BIGINT AS sum_score,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM allr GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_identity" ->
      """SELECT count(*) AS row_cnt, count(*) AS id_ndv,
        |  10::BIGINT AS min_id,
        |  (10 + 3 * (count(*) - 1))::BIGINT AS max_id,
        |  (10 * count(*) + 3 * (count(*) * (count(*) - 1) // 2))::BIGINT
        |    AS sum_rid,
        |  sum(doc_id)::BIGINT AS sum_doc
        | FROM documents""".stripMargin.replace("\n", ""),

    "q_txn_default_evolve" ->
      """WITH allr AS (
        |  SELECT doc_id, lang, 777::BIGINT AS score FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, 777::BIGINT FROM documents
        |   WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, lang, n_chars::BIGINT FROM documents
        |   WHERE doc_id % 11 = 0)
        |SELECT lang, count(*) AS row_cnt, sum(score)::BIGINT AS sum_score,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM allr GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_widen" ->
      """WITH allr AS (
        |  SELECT doc_id, lang, n_chars::BIGINT AS nc FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, n_chars + 3000000000
        |    FROM documents WHERE doc_id % 5 = 0)
        |SELECT lang, count(*) AS row_cnt, sum(nc)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM allr WHERE nc >= 400 GROUP BY 1 ORDER BY lang"""
        .stripMargin.replace("\n", ""),

    "q_txn_identity_sync" ->
      """WITH a AS (SELECT count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS s
        |             FROM documents WHERE doc_id % 2 = 0),
        |     e AS (SELECT count(*)::BIGINT AS n, max(doc_id)::BIGINT AS mx,
        |                  sum(doc_id)::BIGINT AS s
        |             FROM documents WHERE doc_id % 97 = 0),
        |     b AS (SELECT count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS s
        |             FROM documents WHERE doc_id % 2 = 1)
        |SELECT (a.n + e.n + b.n) AS row_cnt,
        |  (a.n + e.n + b.n) AS id_ndv,
        |  1::BIGINT AS min_id,
        |  (1000000 + e.mx + b.n)::BIGINT AS max_id,
        |  (a.n * (a.n + 1) // 2 + 1000000 * e.n + e.s
        |    + b.n * (1000000 + e.mx) + b.n * (b.n + 1) // 2)::BIGINT
        |    AS sum_rid,
        |  (a.s + e.s + b.s)::BIGINT AS sum_doc
        | FROM a, e, b""".stripMargin.replace("\n", ""),

    "q_txn_cluster_sql" ->
      """SELECT doc_id, lang, n_chars FROM documents
        | WHERE n_chars BETWEEN 460 AND 5000
        | ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_gen_partition" ->
      """SELECT * FROM (
        |  SELECT 'prune' AS via, n_chars // 100 AS band,
        |    count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |    sum(doc_id)::BIGINT AS sum_id
        |   FROM documents WHERE n_chars // 100 IN (4, 5) GROUP BY 2
        |  UNION ALL
        |  SELECT 'full' AS via, n_chars // 100 AS band,
        |    count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |    sum(doc_id)::BIGINT AS sum_id
        |   FROM documents WHERE n_chars // 100 <> 2 GROUP BY 2)
        | ORDER BY via, band""".stripMargin.replace("\n", ""),

    "q_txn_replace_where" ->
      """SELECT lang, count(*) AS row_cnt, sum(nc)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM (
        |  SELECT doc_id, lang, n_chars AS nc FROM documents
        |   WHERE n_chars < 400
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars + 100000 AS nc FROM documents
        |   WHERE n_chars >= 400 AND doc_id % 2 = 0)
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_replace_decon" ->
      """SELECT lang, count(*) AS row_cnt, sum(nc)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM (
        |  SELECT doc_id, lang, n_chars AS nc FROM documents
        |   WHERE n_chars % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id, lang, 0 AS nc FROM documents
        |   WHERE n_chars % 7 = 0 AND doc_id % 2 = 0)
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_fsck" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents WHERE lang <> 'de'
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_merge_evolve" ->
      """SELECT lang, count(*) AS row_cnt,
        |  coalesce(sum(CASE WHEN doc_id % 4 = 0 AND n_chars >= 500
        |    THEN n_chars END), 0)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents
        | WHERE NOT (doc_id % 4 = 0 AND n_chars < 500)
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_copy_into" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin
        .replace("\n", ""),

    "q_txn_clone" ->
      """SELECT via, lang, row_cnt, sum_chars, sum_id FROM (
        |  SELECT 'src' AS via, lang, count(*) AS row_cnt,
        |    sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_id
        |   FROM documents WHERE doc_id % 3 <> 0 GROUP BY lang
        |  UNION ALL
        |  SELECT 'clone' AS via, lang, count(*) AS row_cnt,
        |    sum(nc)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_id
        |   FROM (
        |    SELECT doc_id, lang, n_chars AS nc FROM documents
        |     WHERE lang <> 'en'
        |    UNION ALL
        |    SELECT doc_id, lang, 0 AS nc FROM documents WHERE lang = 'en')
        |   GROUP BY lang
        |  UNION ALL
        |  SELECT 'clone_v0' AS via, lang, count(*) AS row_cnt,
        |    sum(n_chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_id
        |   FROM documents GROUP BY lang)
        | ORDER BY via, lang""".stripMargin.replace("\n", ""),

    "q_txn_insert_dynamic" ->
      """SELECT lang, count(*) AS row_cnt, sum(nc)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM (
        |  SELECT doc_id, lang, n_chars + 100000 AS nc FROM documents
        |   WHERE lang IN ('de', 'fr') AND doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars AS nc FROM documents
        |   WHERE lang NOT IN ('de', 'fr', 'zh'))
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_bloom_skip" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         | WHERE doc_id IN (${bloomProbeIds.mkString(",")})
         | ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_bloom_sql" ->
      s"""SELECT doc_id, lang, source, n_chars FROM documents
         | WHERE doc_id IN (${bloomProbeIds.mkString(",")})
         | ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_bloom_semijoin" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        | WHERE doc_id IN (SELECT doc_id FROM documents WHERE doc_id % 499 = 0)
        | ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_range_sql" ->
      """SELECT doc_id, lang, n_chars FROM documents
        | WHERE n_chars BETWEEN 460 AND 5000
        | ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_compact_files" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_table_stats" ->
      """WITH c AS (SELECT lang, source, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT lang, source AS mode_source,
        |  row_number() OVER (PARTITION BY lang ORDER BY c DESC, source) AS rn
        |  FROM c),
        |st AS (SELECT lang, count(*) AS row_cnt,
        |  count(DISTINCT source) AS ndv_source,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  sum(n_chars)::BIGINT AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |  FROM documents GROUP BY 1)
        |SELECT st.lang, row_cnt, ndv_source, min_chars, max_chars,
        |  sum_chars, min_id, max_id, mode_source
        | FROM st JOIN m ON st.lang = m.lang AND m.rn = 1
        | ORDER BY st.lang""".stripMargin.replace("\n", ""),

    "q_stats_prune" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        | WHERE n_chars >= 520 ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_merge" ->
      """WITH delta AS (
        |  SELECT doc_id, lang, n_chars + 1000 AS n_chars FROM documents
        |   WHERE doc_id % 7 = 0 AND doc_id % 5 <> 4
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 5 = 4),
        |merged AS (
        |  SELECT * FROM delta
        |  UNION ALL
        |  SELECT doc_id, lang, n_chars FROM documents
        |   WHERE doc_id % 5 <> 4
        |     AND doc_id NOT IN (SELECT doc_id FROM delta))
        |SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM merged WHERE doc_id % 9 <> 0
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_changes" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS _change, lang, count(*) AS row_cnt,
        |    sum(doc_id)::BIGINT AS sum_id FROM documents
        |   WHERE doc_id % 2 = 1 AND n_chars >= 300 GROUP BY 2
        |  UNION ALL
        |  SELECT 'delete' AS _change, lang, count(*) AS row_cnt,
        |    sum(doc_id)::BIGINT AS sum_id FROM documents
        |   WHERE doc_id % 2 = 0 AND n_chars < 300 GROUP BY 2)
        | ORDER BY _change, lang""".stripMargin.replace("\n", ""),

    "q_txn_skip_str" ->
      """SELECT doc_id, lang, n_chars FROM documents
        | WHERE lang BETWEEN 'es' AND 'zz'
        | ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_changes_sql" ->
      """SELECT * FROM (
        |  SELECT 'insert' AS _change, lang, count(*) AS row_cnt,
        |    sum(doc_id)::BIGINT AS sum_id FROM documents
        |   WHERE doc_id % 2 = 1 AND n_chars >= 300 GROUP BY 2
        |  UNION ALL
        |  SELECT 'delete' AS _change, lang, count(*) AS row_cnt,
        |    sum(doc_id)::BIGINT AS sum_id FROM documents
        |   WHERE doc_id % 2 = 0 AND n_chars < 300 GROUP BY 2)
        | ORDER BY _change, lang""".stripMargin.replace("\n", ""),

    "q_txn_skip" ->
      """SELECT doc_id, lang, n_chars FROM documents
        | WHERE n_chars >= 460 ORDER BY doc_id""".stripMargin.replace("\n", ""),

    "q_txn_sql_dml" ->
      """SELECT lang, count(*) AS row_cnt, sum(nc)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM (SELECT doc_id, lang,
        |   CASE WHEN doc_id % 11 = 0 THEN 0
        |        WHEN doc_id % 7 = 0 THEN n_chars + 1000
        |        ELSE n_chars END AS nc
        |  FROM documents
        |  WHERE doc_id % 11 = 0 OR doc_id % 9 <> 0)
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_sql_decon" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents
        | WHERE doc_id NOT IN (SELECT doc_id FROM documents
        |                      WHERE doc_id % 17 = 0 OR n_chars < 220)
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_sql_merge_clauses" ->
      """SELECT lang, count(*) AS row_cnt, sum(nc)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM (SELECT doc_id, lang,
        |   CASE WHEN doc_id % 3 = 0 THEN n_chars * 2
        |        WHEN n_chars < 250 THEN 0
        |        ELSE n_chars END AS nc
        |  FROM documents
        |  WHERE NOT (doc_id % 3 = 0 AND n_chars < 300))
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_column_map" ->
      """WITH upd AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN n_chars + 1000
        |         ELSE n_chars END AS chars,
        |    NULL AS lang FROM documents),
        |ins AS (
        |  SELECT doc_id + 1000000 AS doc_id, n_chars AS chars, lang
        |   FROM documents WHERE doc_id % 13 = 0),
        |allr AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT coalesce(lang, '_') AS lang2, count(*) AS row_cnt,
        |  sum(chars)::BIGINT AS sum_chars, sum(doc_id)::BIGINT AS sum_id
        | FROM allr GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", ""),

    "q_txn_skip2" ->
      """SELECT * FROM (
        |  SELECT 'id' AS via, doc_id, lang, n_chars FROM documents
        |   WHERE doc_id <= 99
        |  UNION ALL
        |  SELECT 'chars' AS via, doc_id, lang, n_chars FROM documents
        |   WHERE n_chars >= 460)
        | ORDER BY via, doc_id""".stripMargin.replace("\n", ""),

    "q_txn_delete_mor" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents WHERE n_chars >= 250 AND doc_id % 13 <> 0
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_compact_small" ->
      """SELECT lang, count(*) AS row_cnt, sum(n_chars)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_txn_update_mor" ->
      """SELECT lang, count(*) AS row_cnt,
        |  sum(CASE WHEN n_chars > 400 THEN n_chars + 10000
        |      ELSE n_chars END)::BIGINT AS sum_chars,
        |  sum(doc_id)::BIGINT AS sum_id
        | FROM documents WHERE doc_id % 7 <> 0
        | GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", ""),

    "q_compact_cluster" ->
      """SELECT event_type, count(*) AS row_cnt,
        |  sum(user_id)::BIGINT AS sum_uid,
        |  min(event_id) AS min_eid, max(event_id) AS max_eid
        | FROM events GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", ""),

    "q_stats_incremental" ->
      """SELECT source, count(*) AS row_cnt,
        |  min(n_chars) AS min_v, max(n_chars) AS max_v
        | FROM documents GROUP BY 1 ORDER BY source"""
        .stripMargin.replace("\n", ""),

    "q_time_travel" ->
      """SELECT lang,
        |  count(*) FILTER (WHERE doc_id % 2 = 0) AS rows_v0,
        |  count(*) AS rows_now, sum(n_chars)::BIGINT AS sum_chars
        | FROM documents GROUP BY 1 ORDER BY lang"""
        .stripMargin.replace("\n", "")
  )
}
