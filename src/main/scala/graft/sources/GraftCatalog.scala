package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
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

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): java.io.File =
    new java.io.File((root +: namespace).mkString("/"))

  override def listNamespaces(): Array[Array[String]] = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
    dirs.filter(_.isDirectory).map(d => Array(d.getName)).sortBy(_.head)
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (nsDir(namespace).isDirectory) Array.empty
    else throw new NoSuchNamespaceException(namespace)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || nsDir(namespace).isDirectory

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespaceExists(namespace))
      Map("location" -> nsDir(namespace).getPath).asJava
    else throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val files = Option(nsDir(namespace).listFiles()).getOrElse(Array.empty)
    files.filter(_.getName.endsWith(".parquet"))
      .map(f => Identifier.of(namespace, f.getName.stripSuffix(".parquet")))
      .sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    new java.io.File(nsDir(ident.namespace()), s"${ident.name}.parquet").exists()

  override def loadTable(ident: Identifier): Table = {
    val path = new java.io.File(nsDir(ident.namespace()),
      s"${ident.name}.parquet")
    // The analyzer catches NoSuchTableException and turns it into a
    // clean TABLE_OR_VIEW_NOT_FOUND; any other type would surface as
    // an internal-looking crash (round-8 review finding).
    if (!path.exists()) throw new NoSuchTableException(ident)
    ParquetTable(ident.toString, SparkSession.active,
      new CaseInsensitiveStringMap(Map("path" -> path.getPath).asJava),
      Seq(path.getPath), userSpecifiedSchema = None,
      classOf[ParquetFileFormat])
  }

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"catalog $catalogName is read-only: $op is not supported")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = readOnly("createTable")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("alterTable")

  override def dropTable(ident: Identifier): Boolean = readOnly("dropTable")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("renameTable")

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = readOnly("createNamespace")

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly("alterNamespace")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = readOnly("dropNamespace")
}
