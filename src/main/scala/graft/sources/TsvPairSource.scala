package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for the reference engine's native on-disk format: line
  * text of `word \t doc_id` pairs (the index job's interchange format,
  * `trace-insertindex-job/src/main/java/org/example/TraceInsertIndexMapper.java:103-115`)
  * — as a first-class READABLE TABLE instead of a read.text + split
  * projection:
  *
  *  - **Schema** `(word string, doc_id string)`, with COLUMN PRUNING
  *    pushed into the reader ([[SupportsPushDownRequiredColumns]]): a
  *    `select(word)` never materializes doc_id strings, and a bare
  *    `count(*)` materializes neither — visible as `ReadSchema` in the
  *    plan, exactly like the parquet scans.
  *  - **Malformed-row accounting as a SCAN METRIC** (`malformedLines`,
  *    [[CustomSumMetric]]): the reference's `MALFORMED_LINES` counter
  *    surfaces in the SQL UI per scan, instead of requiring the
  *    `Dataset.observe` side-channel of [[graft.operators.InvertedIndex.parsePairsCounted]].
  *    Semantics mirror the mapper exactly: Java-trim, drop if empty,
  *    split on the first tab, drop if no tab — dropped rows count as
  *    malformed, never surface as data.
  *  - **Small-file packing** (the reference's S3 CombineTextInputFormat
  *    semantic): files are greedy-packed into partitions up to
  *    `spark.sql.files.maxPartitionBytes`, so a directory of a million
  *    small part files does not become a million tasks. A 100 TB
  *    deployment would add byte-range splits WITHIN large files
  *    (first-partial-line handoff); at this format's observed file
  *    sizes (reducer outputs), per-file packing is the binding case.
  */
class TsvPairSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tsvpair"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TsvPairSource.fullSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new TsvPairTable(properties.get("path"))
}

object TsvPairSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("doc_id", StringType, nullable = false)))

  /** Hadoop Configuration is not Serializable; it IS Writable. This
    * wrapper ships the driver's conf to executors so the reader opens
    * files against the same filesystem settings the planner listed them
    * with (local runs don't need it; HDFS/S3 deployments do). */
  final class SerializableHadoopConf(@transient var conf: Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }
}

final class TsvPairTable(path: String) extends Table with SupportsRead {
  require(path != null, "tsvpair source requires a path (spark.read.format(...).load(path))")
  override def name(): String = s"tsvpair:$path"
  override def schema(): StructType = TsvPairSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvPairScanBuilder(path)
}

final class TsvPairScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TsvPairSource.fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TsvPairScan(path, required)
}

final class TsvPairScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"tsvpair $path ReadSchema: ${required.catalogString}"

  override def supportedCustomMetrics(): Array[CustomMetric] =
    Array(new TsvLinesMetric, new TsvMalformedMetric)

  /** Driver-side planning: list the data files and greedy-pack them
    * into partitions up to maxPartitionBytes (largest-first, so the
    * bins balance). */
  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(hconf)
    val it = fs.listFiles(root, true)
    // Spark's own file-index semantics: a file is hidden when ANY path
    // component below the root starts with '_' or '.', not just the
    // leaf — listFiles recurses, so part-files under a leftover
    // `_temporary/attempt_*/` from a failed or concurrent write have
    // clean basenames but must not be read as live rows.
    val qRoot = fs.makeQualified(root).toString
    def hidden(p: Path): Boolean = {
      var cur = p
      while (cur != null && cur.toString != qRoot) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return true
        cur = cur.getParent
      }
      false
    }
    val files = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filter(st => !hidden(st.getPath))
      .map(st => (st.getPath.toString, st.getLen))
      .toSeq
    val maxBytes = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")).max(1L)
    val bins = scala.collection.mutable.ArrayBuffer[
      (scala.collection.mutable.ArrayBuffer[String], Long)]()
    files.sortBy(-_._2).foreach { case (f, len) =>
      bins.indexWhere(_._2 + len <= maxBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(f), len))
        case i  => bins(i) = (bins(i)._1 += f, bins(i)._2 + len)
      }
    }
    bins.map(b => TsvFilesPartition(b._1.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TsvPairReaderFactory(
      required.fieldNames,
      new TsvPairSource.SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))
}

final case class TsvFilesPartition(files: Array[String]) extends InputPartition

final class TsvPairReaderFactory(
    fields: Array[String],
    hconf: TsvPairSource.SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TsvPairReader(partition.asInstanceOf[TsvFilesPartition].files, fields, hconf.conf)
}

/** Executor-side reader over a packed bin of files. One pass per line:
  * trim → empty/tab checks → at most one indexOf + the substrings the
  * pruned schema actually needs. */
final class TsvPairReader(
    files: Array[String], fields: Array[String], hconf: Configuration)
    extends PartitionReader[InternalRow] {

  private var fileIdx = 0
  private var reader: java.io.BufferedReader = _
  private var row: InternalRow = _
  private var lines = 0L
  private var malformed = 0L

  private def nextReader(): Boolean = {
    if (reader != null) { reader.close(); reader = null }
    if (fileIdx >= files.length) return false
    val p = new Path(files(fileIdx))
    fileIdx += 1
    reader = new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(hconf).open(p), java.nio.charset.StandardCharsets.UTF_8))
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (reader == null && !nextReader()) return false
      val line = reader.readLine()
      if (line == null) { reader.close(); reader = null }
      else {
        lines += 1
        val t = line.trim
        val tab = t.indexOf('\t')
        if (t.isEmpty || tab < 0) malformed += 1
        else {
          val vals = fields.map {
            case "word"   => UTF8String.fromString(t.substring(0, tab))
            case "doc_id" => UTF8String.fromString(t.substring(tab + 1))
          }
          row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
          return true
        }
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (reader != null) { reader.close(); reader = null }

  override def currentMetricsValues(): Array[CustomTaskMetric] = Array(
    TsvTaskMetric("tsvLinesIn", lines),
    TsvTaskMetric("tsvMalformedLines", malformed))
}

final case class TsvTaskMetric(name: String, value: Long) extends CustomTaskMetric

final class TsvLinesMetric extends CustomSumMetric {
  override def name(): String = "tsvLinesIn"
  override def description(): String = "tsvpair: total lines scanned"
}

final class TsvMalformedMetric extends CustomSumMetric {
  override def name(): String = "tsvMalformedLines"
  override def description(): String = "tsvpair: malformed lines dropped (reference MALFORMED_LINES)"
}
