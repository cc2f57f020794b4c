package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GlobalSort, InvertedIndex, WordCount}
import graft.sources.Tables

/** The reference's three kernels (SURVEY §2: P1-P6, A1-A3, O1) evaluated
  * over the driver's `documents` table, with DuckDB oracle SQL.
  *
  * The reference runs these over line-text files; the oracle harness runs
  * over the shared parquet tables, so the text pipelines here take
  * `documents.text` as the line source (one "line" per document).
  */
object ParityQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1-P3 + A1 + O3: tokenize/normalize/filter/group-count/sort-by-key.
    "q_wordcount" -> ((s, d) =>
      WordCount(Tables.documents(s, d), "text")),

    // O1: global sort (range partition + per-partition sort = total order).
    "q_sort" -> ((s, d) =>
      GlobalSort(Tables.documents(s, d).select("doc_id", "text"),
        "text").orderBy("text", "doc_id")),

    // P4-P5 + A2: inverted index word → sorted distinct doc ids.
    "q_inverted_index" -> ((s, d) => {
      val toks = WordCount.tokens(Tables.documents(s, d), "text", "doc_id")
      InvertedIndex.postings(toks, col("word"), col("doc_id"))
    }),

    // A2 variant at scale: salted two-phase collect_set (heavy-key path).
    // Same semantics as q_inverted_index — the oracle is identical SQL.
    "q_inverted_index_salted" -> ((s, d) => {
      val toks = WordCount.tokens(Tables.documents(s, d), "text", "doc_id")
      InvertedIndex.saltedPostings(toks, col("word"), col("doc_id"))
    }),

    // P4-P5 end-to-end through the reference's NATIVE on-disk format:
    // build `word \t docId` lines from documents (with injected
    // malformed rows — tab-less / whitespace-only), write them through
    // the TSV line sink, then read them back via the [[graft.sources.TsvPairSource]]
    // DataSourceV2 — a first-class (word, doc_id) table with column
    // pruning and the malformed-line count as a scan metric — and index
    // what survives. The oracle states the SEMANTICS (malformed rows
    // excluded) rather than mirroring the parse, so a source that
    // leaked bad rows would fail.
    "q_parse_pairs_index" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val firstTok = element_at(graft.functions.TextFunctions.tokens(col("text")), 1)
      val lines = docs.select(
        when(col("doc_id") % 10 === 0, lit("malformed line with no tab"))
          .when(col("doc_id") % 10 === 1, lit("   "))
          .otherwise(concat(firstTok, lit("\t"), concat(lit("doc"), col("doc_id"))))
          .as("value"))
      // applicationId in the path: two concurrent runs on one host at
      // the same sf would otherwise race on overwrite-while-read.
      val out = s"${sys.props("java.io.tmpdir")}/graft_tsv_${s.sparkContext.applicationId}_${new java.io.File(d).getName}/pairs"
      lines.write.mode("overwrite").text(out)
      InvertedIndex(s.read.format("tsvpair").load(out))
    }),

    // S4/S5 at 100 TB: partitioned-dataset sink + partition-pruned scan
    // — the first thing a large table hits in production (write once
    // partitioned by lang; every downstream job reads only its
    // partition's directories, a metadata decision that never opens the
    // other partitions' files). The query round-trips the WHOLE path:
    // partitioned write, pruned read (PlanAuditSpec pins the predicate
    // as a PartitionFilter, not a data filter), oracle-checked values.
    "q_partition_prune" -> ((s, d) => {
      val out = s"${sys.props("java.io.tmpdir")}/graft_part_${s.sparkContext.applicationId}_${new java.io.File(d).getName}/docs"
      Tables.documents(s, d)
        .write.mode("overwrite").partitionBy("lang").parquet(out)
      s.read.parquet(out)
        .filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // O2: hash-partitioned sorted runs (reference `--reducers N>1`).
    // run_id is an engine-independent hash so the oracle can mirror the
    // run assignment; the trailing orderBy is harness determinism only —
    // the operator's contract is per-partition order.
    "q_sorted_runs" -> ((s, d) => {
      val withRun = Tables.documents(s, d)
        .select(col("doc_id"), col("text"),
          (graft.functions.TextFunctions.hash60(col("text")) % 4).as("run_id"))
      GlobalSort.sortedRuns(withRun, 4, "run_id", "text", "doc_id")
        .orderBy("run_id", "text", "doc_id")
    })
  )

  private val tokenSub =
    """SELECT doc_id, regexp_replace(lower(unnest(string_split_regex(text, '\s+'))), '[^a-z]', '', 'g') AS word
      | FROM documents""".stripMargin.replace("\n", "")

  private val indexSql =
    s"""SELECT word, array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS doc_ids
       | FROM ($tokenSub) t WHERE length(word) > 0
       | GROUP BY word ORDER BY word""".stripMargin.replace("\n", "")

  def oracle: Map[String, String] = Map(
    "q_wordcount" ->
      s"""SELECT word, count(*) AS cnt FROM ($tokenSub) t
         | WHERE length(word) > 0 GROUP BY word ORDER BY word"""
        .stripMargin.replace("\n", ""),
    "q_sort" ->
      "SELECT doc_id, text FROM documents ORDER BY text, doc_id",
    "q_inverted_index" -> indexSql,
    "q_inverted_index_salted" -> indexSql,
    "q_parse_pairs_index" ->
      s"""SELECT word, array_to_string(list_sort(list(DISTINCT doc)), ',') AS doc_ids
         | FROM (SELECT t[1] AS word, 'doc' || doc_id::VARCHAR AS doc
         |        FROM (SELECT doc_id, ${OracleSql.toks("text")} AS t FROM documents)
         |        WHERE doc_id % 10 NOT IN (0, 1))
         | GROUP BY word ORDER BY word""".stripMargin.replace("\n", ""),
    "q_sorted_runs" ->
      s"""SELECT doc_id, text, ${OracleSql.hash60("text")} % 4 AS run_id
         | FROM documents ORDER BY run_id, text, doc_id"""
        .stripMargin.replace("\n", ""),
    "q_partition_prune" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        | WHERE lang = 'en' ORDER BY doc_id""".stripMargin.replace("\n", "")
  )
}
