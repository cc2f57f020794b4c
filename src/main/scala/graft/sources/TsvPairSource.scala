package graft.sources

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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

final class TsvPairTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null, "tsvpair source requires a path (spark.read.format(...).load(path))")
  override def name(): String = s"tsvpair:$path"
  override def schema(): StructType = TsvPairSource.fullSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvPairScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new TsvPairWriteBuilder(path, info)
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

// ---------------------------------------------------------------------------
// Write path: the other half of the DSv2 contract, with the real
// two-phase commit protocol. Tasks write to a per-query staging dir
// (`_staging_<queryId>/part-<partition>-<task>-<query>.tsv` — the
// query token keeps file names unique ACROSS applications, so an
// append from a fresh JVM whose task ids restart at 0 can never
// rename over a previous generation's files); a task that fails
// ABORTS its own file, a failed job aborts the whole staging dir,
// and only the driver-side BatchWrite.commit MOVES staged files into
// the root and stamps `_SUCCESS`. Overwrite arrives as
// SupportsTruncate and commit PUBLISHES the new generation before
// deleting the old one: a failure mid-commit can leave BOTH
// generations visible (duplicates, detectable via the missing
// `_SUCCESS`), but never loses committed data — the strictly safer
// side of the window. Full single-visible-generation atomicity needs
// a manifest/version pointer, which is a table-format concern
// (Delta/Iceberg), not a file-sink one.
// ---------------------------------------------------------------------------

final class TsvPairWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val names = info.schema().fieldNames
    // Validate names DRIVER-side: a bad schema must fail at planning
    // time as one clear error, not as 4x-retried executor crashes.
    require(names.length == 2 && names.contains("word")
        && names.contains("doc_id"),
      s"tsvpair expects (word, doc_id), got ${names.mkString(",")}")
    new TsvPairWrite(path, info.queryId(), names, doTruncate)
  }
}

final class TsvPairWrite(path: String, queryId: String,
    fieldNames: Array[String], doTruncate: Boolean) extends Write {
  override def toBatch: BatchWrite =
    new TsvPairBatchWrite(path, queryId, fieldNames, doTruncate,
      new TsvPairSource.SerializableHadoopConf(
        SparkSession.active.sessionState.newHadoopConf()))
}

final case class TsvCommitMessage(stagedFiles: Array[String])
    extends WriterCommitMessage

final class TsvPairBatchWrite(path: String, queryId: String,
    fieldNames: Array[String], doTruncate: Boolean,
    hconf: TsvPairSource.SerializableHadoopConf) extends BatchWrite {

  private val stagingName = s"_staging_$queryId"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new TsvPairWriterFactory(path, stagingName, queryId, fieldNames, hconf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.conf)
    // Names of the previous generation BEFORE publishing (query-token
    // file names guarantee no overlap with the new one).
    val oldGen = if (doTruncate)
      Option(fs.listStatus(root)).getOrElse(Array.empty)
        .map(_.getPath).filter { p =>
          val n = p.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
    else Array.empty[Path]
    // PUBLISH first: a failure here leaves the old generation intact.
    messages.foreach {
      case TsvCommitMessage(files) => files.foreach { f =>
        val src = new Path(f)
        if (!fs.rename(src, new Path(root, src.getName)))
          throw new java.io.IOException(s"tsvpair commit: rename failed for $src")
      }
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    // Then retire the old generation (overwrite only).
    oldGen.foreach(fs.delete(_, true))
    fs.delete(new Path(root, stagingName), true)
    fs.create(new Path(root, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.conf)
    fs.delete(new Path(root, stagingName), true)
  }
}

final class TsvPairWriterFactory(path: String, stagingName: String,
    queryId: String, fieldNames: Array[String],
    hconf: TsvPairSource.SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new TsvPairDataWriter(path, stagingName, queryId, fieldNames,
      partitionId, taskId, hconf.conf)
}

/** Executor-side writer: one staged file per task attempt (the
  * partitionId-taskId name keeps speculative attempts from colliding;
  * the driver's commit coordinator admits exactly one attempt per
  * partition). */
final class TsvPairDataWriter(path: String, stagingName: String,
    queryId: String, fieldNames: Array[String], partitionId: Int,
    taskId: Long, hconf: Configuration) extends DataWriter[InternalRow] {

  // The query token makes the PUBLISHED name globally unique: task ids
  // restart per application, so without it a later append could
  // rename over an earlier generation's part file (silent loss on
  // POSIX rename).
  private val file = new Path(new Path(new Path(path), stagingName),
    f"part-$partitionId%05d-$taskId-${queryId.takeRight(12)}.tsv")
  private val wordIdx = fieldNames.indexOf("word")
  private val docIdx = fieldNames.indexOf("doc_id")
  require(wordIdx >= 0 && docIdx >= 0,
    s"tsvpair expects (word, doc_id), got ${fieldNames.mkString(",")}")

  private var out: java.io.BufferedWriter = _
  private def writer(): java.io.BufferedWriter = {
    if (out == null) {
      val fs = file.getFileSystem(hconf)
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(file, true), java.nio.charset.StandardCharsets.UTF_8))
    }
    out
  }

  override def write(row: InternalRow): Unit = {
    val w = writer()
    w.write(row.getUTF8String(wordIdx).toString)
    w.write('\t')
    w.write(row.getUTF8String(docIdx).toString)
    w.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) { out.close(); out = null }
    // Empty partitions stage nothing and commit nothing.
    val fs = file.getFileSystem(hconf)
    if (fs.exists(file)) TsvCommitMessage(Array(file.toString))
    else TsvCommitMessage(Array.empty)
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); out = null }
    val fs = file.getFileSystem(hconf)
    fs.delete(file, false)
  }

  override def close(): Unit =
    if (out != null) { out.close(); out = null }
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
