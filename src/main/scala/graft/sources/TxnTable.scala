package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DataSourceV2 face of a [[TxnLog]] table — what
  * [[GraftCatalog.loadTable]] returns for a `_log`-carrying directory,
  * giving the lakehouse a full SQL front door:
  *
  *  - READS delegate scan building to Spark's own V2 parquet table
  *    over the snapshot's EXPLICIT file list, so scans stay vectorized
  *    with pushdown/pruning while version isolation comes from the
  *    path set alone (the file list is pinned at `loadTable`, one
  *    consistent snapshot per statement). Tables carrying live
  *    deletion vectors are rewritten to the DV-masked logical plan by
  *    [[graft.plans.TxnSqlDml.MaskedReadRule]] before scan planning —
  *    [[newScanBuilder]] only ever sees mask-free snapshots and throws
  *    otherwise (a bare scan silently over-reading deleted rows would
  *    be a correctness hole).
  *  - WRITES (`INSERT INTO` / `INSERT OVERWRITE`) go through the V1
  *    write fallback (`V1_BATCH_WRITE`): the staged-commit protocol in
  *    [[TxnLog.append]]/[[TxnLog.overwrite]] IS a commit protocol —
  *    re-expressing it as a DSv2 `BatchWrite` would duplicate the
  *    atomicity machinery the log already provides, so the table hands
  *    Spark an `InsertableRelation` and lets the log publish. Schema
  *    validation is two-layered: Spark aligns the INSERT's columns to
  *    [[schema]] (position + cast), then the log's own enforcement
  *    re-checks at commit time.
  *
  * DELETE/UPDATE/MERGE arrive via the parser interception in
  * [[graft.plans.TxnSqlDml]] (see there for why the analyzer's own
  * row-level path can't be joined from an extension) and run the log's
  * native DML — pruned COW delete, MoR update, file-pruned merge. */
class TxnTable(identName: String, val dir: String, val snapshotVersion: Option[Long])
    extends Table with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  /** Snapshot AND log-recorded schema pinned at table-load
    * (= statement) time — one log replay for both (resolving them
    * separately replayed checkpoint + tail twice per statement). */
  private val resolved: (Seq[(String, TxnLog.FileState)], Option[StructType]) =
    TxnLog.resolveSnapshot(spark, dir, snapshotVersion)

  val files: Seq[(String, TxnLog.FileState)] = resolved._1

  def hasDvs: Boolean = files.exists(_._2.dv.isDefined)

  /** True when any column's physical (in-file) name differs from its
    * logical one — post RENAME/DROP COLUMN. Data files carry PHYSICAL
    * names, so a bare parquet scan under the logical schema would
    * silently read the renamed column as all-null; such tables must
    * read through [[TxnLog.readState]] (the masked-read rewrite). */
  def hasColumnMapping: Boolean = resolved._2.exists(TxnLog.hasMapping)

  /** True for PARTITIONED tables: the hive-laid data files do not
    * carry the partition columns (their values ride the paths), so a
    * bare parquet scan would silently read them as all-null — same
    * must-read-through-readState contract as column mapping. */
  def isPartitioned: Boolean =
    resolved._2.exists(s => TxnLog.partitionFields(s).nonEmpty)

  override def name(): String = identName + snapshotVersion.fold("")(v => s"@v$v")

  override val schema: StructType = resolved._2.getOrElse {
    // Pre-schema-tracking log: one merged-footer read, same answer
    // the API path (TxnLog.read's mergeSchema scan) presents. An
    // all-rows-removed snapshot of such a log has NO files to infer
    // from — say so, instead of the reader's unhelpful "unable to
    // infer schema" (round-11 advice).
    if (files.isEmpty) throw new IllegalStateException(
      s"${name()} has an empty snapshot and its log predates schema " +
        "tracking — no schema can be resolved; recreate the table (or " +
        "append once) to record one")
    spark.read.option("mergeSchema", "true")
      .parquet(files.map { case (p, _) => TxnLog.dataPath(dir, p) }: _*).schema
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  private def parquetDelegate: ParquetTable =
    ParquetTable(name(), spark,
      new CaseInsensitiveStringMap(Map("path" -> dir).asJava),
      files.map { case (p, _) => TxnLog.dataPath(dir, p) },
      userSpecifiedSchema = Some(schema), classOf[ParquetFileFormat])

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (hasDvs)
      throw new UnsupportedOperationException(
        s"${name()} carries live deletion vectors and this session has no " +
          "graft extensions to apply the mask — enable graft.GraftExtensions " +
          "(spark.sql.extensions) or read via TxnLog.read")
    if (hasColumnMapping)
      // A bare scan would bind the LOGICAL schema to files carrying
      // PHYSICAL names and return all-null for every renamed column —
      // refuse loudly rather than corrupt silently.
      throw new UnsupportedOperationException(
        s"${name()} uses column mapping (a column was renamed/dropped) and " +
          "this session has no graft extensions to translate names — enable " +
          "graft.GraftExtensions (spark.sql.extensions) or read via TxnLog.read")
    if (isPartitioned)
      throw new UnsupportedOperationException(
        s"${name()} is partitioned (values live in the file paths) and this " +
          "session has no graft extensions to attach them — enable " +
          "graft.GraftExtensions (spark.sql.extensions) or read via TxnLog.read")
    parquetDelegate.newScanBuilder(options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (snapshotVersion.isDefined)
      throw new UnsupportedOperationException(
        s"cannot write to time-traveled snapshot ${name()}: writes go to " +
          "the table's tip")
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              val s = data.sparkSession
              if (replace || overwrite) TxnLog.overwrite(s, dir, data)
              else TxnLog.append(s, dir, data)
              ()
            }
          }
      }
    }
  }
}
