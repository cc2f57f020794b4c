package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A READ-ONLY DataSourceV2 `TableCatalog` that exposes a directory of
  * scale-factor table directories (the TESTDATA.md layout — or any lake
  * laid out `<root>/<namespace>/<table>.parquet`) as a first-class SQL
  * catalog:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.root", "/root/testdata")
  *   spark.sql("SELECT count(*) FROM graft.`sf0.01`.documents")
  * }}}
  *
  * `loadTable` hands back Spark's own V2 parquet table for the path, so
  * scans get the REAL parquet reader — vectorized decode, column
  * pruning, predicate pushdown, partition pruning — with zero reader
  * code here; the catalog's whole job is name resolution. The
  * reference has no catalog concept at all (paths in job args,
  * `TraceWordCountJob.java:86-90`); on Spark a catalog is how a
  * 100 TB lake keeps query text stable while storage moves.
  *
  * Write/DDL operations throw `UnsupportedOperationException`: the
  * engine's sinks (TextIO, partitioned parquet, bucketed tables) own
  * their outputs, and the driver's testdata is read-only by contract.
  *
  * Note: `events.parquet` is stored as TIMESTAMP(NANOS); reading it
  * through the raw catalog under `nanosAsLong=true` yields the ns
  * longs — [[Tables.events]] remains the canonical converted view.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private var writable: Boolean = false

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root"))
    // DDL is an explicit opt-in (spark.sql.catalog.<name>.writable):
    // the driver's testdata lake is read-only BY CONTRACT, while a
    // user lake root gets the full CREATE/DROP + DML lifecycle.
    writable = Option(options.get("writable")).exists(_.toBoolean)
  }

  override def name(): String = catalogName

  // All listing/probing goes through the Hadoop FileSystem API (the
  // same stack the parquet scan uses), so the catalog works against
  // ANY supported root scheme — hdfs://, s3a://, file:/ — not just
  // java.io-visible local paths (round-8 review finding: java.io.File
  // on a remote root silently reported every table as nonexistent).
  private def fs(p: Path) =
    p.getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private def nsPath(namespace: Array[String]): Path =
    new Path((root +: namespace).mkString("/"))

  override def listNamespaces(): Array[Array[String]] = {
    val rootP = new Path(root)
    val f = fs(rootP)
    if (!f.exists(rootP)) return Array.empty
    f.listStatus(rootP).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val p = nsPath(namespace)
      val f = fs(p)
      f.exists(p) && f.getFileStatus(p).isDirectory
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace))
      Map("location" -> nsPath(namespace).toString).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    val f = fs(p)
    if (!f.exists(p)) return Array.empty
    val plain = f.listStatus(p).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
    val txn = f.listStatus(p).filter(_.isDirectory).map(_.getPath)
      .filter(d => f.exists(new Path(d, "_log"))).map(_.getName)
    (plain ++ txn).distinct.map(Identifier.of(namespace, _)).sortBy(_.name)
  }

  private def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), s"${ident.name}.parquet")

  /** A [[TxnLog]] table is a DIRECTORY (no `.parquet` suffix) carrying
    * a `_log/`. */
  private def txnPath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace()), ident.name)

  private def isTxnTable(ident: Identifier): Boolean = {
    val d = txnPath(ident)
    fs(d).exists(new Path(d, "_log"))
  }

  /** The txn-table directory behind `ident`, when it is one — the
    * SQL-DML parser intercept ([[graft.plans.TxnSqlDml]]) resolves
    * targets through this. */
  private[graft] def txnDirIfExists(ident: Identifier): Option[String] =
    if (isTxnTable(ident)) Some(txnPath(ident).toString) else None

  /** The directory a NEW txn table named `ident` would live at —
    * refuses when anything already claims the name. The CLONE
    * statement resolves name-addressed DESTINATIONS through this
    * (`CLONE src TO lake.ns.dup`): the clone publishes into the
    * catalog layout and is name-addressable from its first commit. */
  private[graft] def txnDirForNew(ident: Identifier): String = {
    require(!tableExists(ident),
      s"cannot clone into ${ident.namespace().mkString(".")}." +
        s"${ident.name}: the table already exists")
    txnPath(ident).toString
  }

  override def tableExists(ident: Identifier): Boolean = {
    val p = tablePath(ident)
    fs(p).exists(p) || isTxnTable(ident)
  }

  override def loadTable(ident: Identifier): Table = {
    val p = tablePath(ident)
    // The analyzer catches NoSuchTableException and turns it into a
    // clean TABLE_OR_VIEW_NOT_FOUND; any other type would surface as
    // an internal-looking crash (round-8 review finding).
    if (fs(p).exists(p))
      ParquetTable(ident.toString, SparkSession.active,
        new CaseInsensitiveStringMap(Map("path" -> p.toString).asJava),
        Seq(p.toString), userSpecifiedSchema = None,
        classOf[ParquetFileFormat])
    else if (isTxnTable(ident)) txnTable(ident, None)
    else throw new NoSuchTableException(ident)
  }

  /** SQL time travel over [[TxnLog]] tables:
    * `SELECT … FROM graft.ns.tbl VERSION AS OF 3`. A non-numeric
    * version is a USER error — surface it as one, not as a raw
    * NumberFormatException that reads like an engine crash. */
  override def loadTable(ident: Identifier, version: String): Table =
    if (isTxnTable(ident)) {
      val v =
        try version.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"VERSION AS OF on $ident needs a numeric commit version, " +
              s"got '$version' (use TIMESTAMP AS OF for time strings)")
        }
      txnTable(ident, Some(v))
    } else throw new UnsupportedOperationException(
      s"$ident is not a transaction-log table; VERSION AS OF needs a _log")

  /** `TIMESTAMP AS OF` resolves to the newest commit whose version
    * file landed at-or-before the timestamp (micros since epoch, per
    * the connector contract) — commit mtime IS the commit time. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!isTxnTable(ident)) throw new UnsupportedOperationException(
      s"$ident is not a transaction-log table; TIMESTAMP AS OF needs a _log")
    txnTable(ident, Some(TxnLog.versionAtTimestamp(
      SparkSession.active, txnPath(ident).toString, timestampMicros)))
  }

  /** Resolve through the log and hand back the [[TxnTable]] face:
    * scans delegate to Spark's V2 parquet table over the snapshot's
    * EXPLICIT file list (vectorized, pushdown, version isolation from
    * the path set alone), schema comes from the LOG (round-10 advice:
    * plain inference forked the SQL view of schema-evolved tables),
    * deletion vectors apply via the masked-read rewrite, and the
    * table is WRITABLE — `INSERT INTO`/`INSERT OVERWRITE` publish
    * through the log's commit protocol. */
  private def txnTable(ident: Identifier, version: Option[Long]): Table =
    new TxnTable(ident.toString, txnPath(ident).toString, version)

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is read-only: $op is not supported " +
        s"(set spark.sql.catalog.$catalogName.writable=true on a lake " +
        "root you own to enable DDL)")

  /** Declared so Spark's analysis admits `GENERATED ALWAYS AS (expr)`
    * and `GENERATED … AS IDENTITY` column clauses in CREATE TABLE —
    * both arrive on the V2 Column objects and translate to the log's
    * own invariants in [[createTable]]. */
  override def capabilities(): util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_GENERATED_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORTS_CREATE_TABLE_WITH_IDENTITY_COLUMNS,
      org.apache.spark.sql.connector.catalog.TableCatalogCapability
        .SUPPORT_COLUMN_DEFAULT_VALUE)

  /** `CREATE TABLE` (and the table half of CTAS): a new transaction-log
    * table — version 0 is an empty commit carrying the SCHEMA, so the
    * table is immediately SELECT-able (0 rows) and every later INSERT
    * is enforced against the declared shape. Writable catalogs only;
    * partition transforms are not part of the log's layout contract.
    *
    * `GENERATED ALWAYS AS` columns translate to the log's
    * [[TxnLog.GeneratedExprKey]] invariant (derived inside every
    * staged write; writer-supplied values recomputed — never
    * writer-owned). COMPOSED WITH `PARTITIONED BY`, this is the
    * derived-partitioning idiom (`day DATE GENERATED ALWAYS AS
    * (CAST(ts AS DATE))` + `PARTITIONED BY (day)`): writers supply
    * only the natural columns, the engine derives the partition value
    * consistently forever, and pruning/dropPartition stay
    * trustworthy — writer-discipline derivation drifts, table-property
    * derivation cannot. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (!writable) readOnly("createTable")
    // `PARTITIONED BY (col, ...)` — identity transforms only (bucket/
    // days/etc. would need value derivation the hive layout cannot
    // round-trip) — and `CLUSTER BY (col, ...)` (liquid-clustering
    // style: recorded as a TABLE PROPERTY so OPTIMIZE with no explicit
    // clause range-clusters on these keys; the grammar makes the two
    // mutually exclusive). Partitioning routes to the log's
    // partitioned create, so every later INSERT lays files out
    // hive-style and partition pruning / dropPartition apply.
    val (clusterTs, partTs) = partitions.toSeq.partition(t =>
      org.apache.spark.sql.connector.expressions.ClusterByTransform
        .unapply(t).isDefined)
    val clusterCols: Seq[String] = clusterTs.flatMap(t =>
      org.apache.spark.sql.connector.expressions.ClusterByTransform
        .unapply(t).get.map { r =>
          if (r.fieldNames.length != 1) throw new UnsupportedOperationException(
            s"graft txn tables support CLUSTER BY (top-level columns) " +
              s"only, got: ${r.fieldNames.mkString(".")}")
          val n = r.fieldNames.head
          if (!schema.fieldNames.exists(_.equalsIgnoreCase(n)))
            throw new IllegalArgumentException(
              s"CLUSTER BY column '$n' not in the table schema")
          n
        })
    val partCols = partTs.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case other => throw new UnsupportedOperationException(
        s"graft txn tables support PARTITIONED BY (top-level identity " +
          s"columns) only, got: $other")
    }
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          Seq(catalogName) ++ ident.namespace().toSeq :+ ident.name)
    val spark = SparkSession.active
    val annotated = StructType(schema.fields.map { f =>
      clusterCols.zipWithIndex.find(_._1.equalsIgnoreCase(f.name)) match {
        case Some((_, i)) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong(TxnLog.ClusterColKey, i.toLong).build())
        case None => f
      }
    })
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], annotated)
    if (partCols.isEmpty) TxnLog.create(spark, txnPath(ident).toString, empty)
    else TxnLog.createPartitioned(spark, txnPath(ident).toString, empty,
      partCols)
    txnTable(ident, None)
  }

  /** The V2-Column form Spark's CREATE TABLE exec actually calls —
    * overridden because the default delegation to the StructType form
    * DROPS `Column.generationExpression()` on the floor (the
    * capability above only admits the syntax); the expressions
    * translate to the log's own [[TxnLog.GeneratedExprKey]] invariant
    * here, then the StructType path runs unchanged. */
  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val fields = columns.map { c =>
      val base = Option(c.metadataInJSON())
        .map(org.apache.spark.sql.types.Metadata.fromJson)
        .getOrElse(org.apache.spark.sql.types.Metadata.empty)
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(base)
      Option(c.comment()).foreach(mb.putString("comment", _))
      Option(c.generationExpression()).foreach(
        mb.putString(TxnLog.GeneratedExprKey, _))
      Option(c.identityColumnSpec()).foreach { id =>
        if (c.dataType != org.apache.spark.sql.types.LongType &&
            c.dataType != org.apache.spark.sql.types.IntegerType)
          throw new UnsupportedOperationException(
            s"identity column '${c.name}' must be BIGINT or INT, got " +
              c.dataType.catalogString)
        mb.putLong(TxnLog.IdentityStartKey, id.getStart)
        mb.putLong(TxnLog.IdentityStepKey, id.getStep)
        mb.putBoolean(TxnLog.IdentityExplicitKey, id.isAllowExplicitInsert)
      }
      Option(c.defaultValue()).foreach { dv =>
        // Spark's OWN metadata keys: analysis fills column-list
        // INSERTs / DEFAULT keywords from them (given the capability),
        // so the SQL front door needs no engine-side rewrite; the
        // graft write paths fill omitted columns in stage().
        val sql = Option(dv.getSql).getOrElse(
          throw new UnsupportedOperationException(
            s"DEFAULT for '${c.name}' carries no SQL form"))
        val k = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
        mb.putString(k.CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql)
        mb.putString(k.EXISTS_DEFAULT_COLUMN_METADATA_KEY, sql)
      }
      StructField(c.name, c.dataType, c.nullable, mb.build())
    }
    createTable(ident, StructType(fields), partitions, properties)
  }

  /** `ALTER TABLE … ADD COLUMNS / RENAME COLUMN / DROP COLUMN`: all
    * three are DATA-LESS schema commits — no immutable data file moves.
    * ADD evolves additively (existing files read null in the new
    * columns); RENAME and DROP are column-mapping metadata commits
    * (the field keeps/retires its PHYSICAL slot, reads translate at
    * scan time, old snapshots time-travel under the old shape). Only
    * top-level columns; retype would genuinely rewrite data and stays
    * unsupported. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!writable) readOnly("alterTable")
    if (!isTxnTable(ident)) throw new UnsupportedOperationException(
      s"$ident is not a graft txn table; ALTER needs a _log")
    val spark = SparkSession.active
    val dir = txnPath(ident).toString
    val cur = TxnLog.tableSchema(spark, dir).getOrElse(
      new TxnTable(ident.toString, dir, None).schema)
    def topLevel(fieldNames: Array[String], what: String): String = {
      if (fieldNames.length != 1) throw new UnsupportedOperationException(
        s"graft txn ALTER supports top-level $what only")
      fieldNames(0)
    }
    val added = changes.collect {
      case a: TableChange.AddColumn =>
        val name = topLevel(a.fieldNames(), "ADD COLUMNS")
        if (cur.fieldNames.exists(_.equalsIgnoreCase(name)))
          throw new IllegalArgumentException(
            s"column '$name' already exists in $ident")
        // A DEFAULT on an ADDED column records BOTH of Spark's default
        // keys (round-15 verdict): CURRENT_DEFAULT fills future writes
        // (column-list INSERTs via Spark's own resolution, graft API
        // writes via stage()), and EXISTS_DEFAULT gives pre-existing
        // rows the Iceberg initial-default read semantics — Spark's
        // parquet reader natively fills a schema column carrying
        // EXISTS_DEFAULT metadata when the FILE physically lacks it
        // (SPARK-39926), which is exactly the per-file criterion:
        // files staged after the add always materialize the column
        // (explicit NULLs included), files from before it fill the
        // frozen default, on every read path (readTagged passes the
        // recorded schema to the scan, DML/CDC/compaction included).
        Option(a.defaultValue()).map { dv =>
          val sql = Option(dv.getSql).getOrElse(
            throw new UnsupportedOperationException(
              s"DEFAULT for added column '$name' carries no SQL form"))
          val k = org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
          val md = new org.apache.spark.sql.types.MetadataBuilder()
            .putString(k.CURRENT_DEFAULT_COLUMN_METADATA_KEY, sql)
            .putString(k.EXISTS_DEFAULT_COLUMN_METADATA_KEY, sql)
            .build()
          StructField(name, a.dataType(), nullable = true, metadata = md)
        }.getOrElse(StructField(name, a.dataType(), nullable = true))
    }
    val rest = changes.filterNot(_.isInstanceOf[TableChange.AddColumn])
    // The merge against the tip happens INSIDE each commit loop
    // (re-validated per attempt): two concurrent additive ALTERs both
    // survive, and a concurrent same-name addition fails as the
    // metadata conflict it is — publishing cur+added computed here
    // would silently drop the concurrent winner's column.
    if (added.nonEmpty) TxnLog.addColumns(spark, dir, added)
    rest.foreach {
      case r: TableChange.RenameColumn =>
        TxnLog.renameColumn(spark, dir,
          topLevel(r.fieldNames(), "RENAME COLUMN"), r.newName())
      case d: TableChange.DeleteColumn =>
        val name = topLevel(d.fieldNames(), "DROP COLUMN")
        if (d.ifExists() && !cur.fieldNames.exists(_.equalsIgnoreCase(name))) ()
        else TxnLog.dropColumn(spark, dir, name)
      case u: TableChange.UpdateColumnType =>
        // Lossless widening only — a metadata commit; files keep their
        // narrow physical encoding and readers promote per file.
        TxnLog.widenColumn(spark, dir,
          topLevel(u.fieldNames(), "ALTER COLUMN TYPE"), u.newDataType())
      case other => throw new UnsupportedOperationException(
        s"graft txn ALTER supports ADD/RENAME/DROP COLUMN and lossless " +
          s"ALTER COLUMN TYPE widening only (got $other): anything else " +
          "would rewrite immutable data files")
    }
    txnTable(ident, None)
  }

  /** `DROP TABLE`: transaction-log tables only (the catalog owns their
    * layout); plain parquet datasets under the root are someone
    * else's data and stay refused even on writable catalogs. */
  override def dropTable(ident: Identifier): Boolean = {
    if (!writable) readOnly("dropTable")
    if (!isTxnTable(ident)) {
      if (tableExists(ident)) throw new UnsupportedOperationException(
        s"$ident is a plain parquet dataset, not a graft txn table — " +
          "refusing to drop data the catalog does not manage")
      false
    } else {
      val d = txnPath(ident)
      fs(d).delete(d, true)
    }
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("renameTable")

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly("createNamespace")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("alterNamespace")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = readOnly("dropNamespace")
}
