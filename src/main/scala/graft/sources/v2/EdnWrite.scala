package graft.sources.v2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration
import graft.edn.Edn

/** Batch write side of the "edn" connector: each partition writes one
  * EDN text file (`part-NNNNN.edn`) — the distributed form of the
  * reference's EDN sink (`src/cognitect/xform/async_edn.clj:66-82`).
  *
  * Two row formats:
  *  - default: one map form per row rendered from the schema (nulls
  *    omitted);
  *  - `option("raw", "true")`: the single string column IS the line
  *    (pre-rendered EDN — the batcher's golden-file mode).
  *
  * Paths go through Hadoop FileSystem (object-store safe) and writers
  * are task-attempt isolated: each attempt writes a taskId-suffixed
  * temp file and renames into place on commit (Spark's commit
  * coordinator guarantees one commit per partition), so speculative
  * or retried tasks never share a file.
  */
final class EdnWriteBuilder(schema: StructType, dir: String,
    options: CaseInsensitiveStringMap) extends WriteBuilder with SupportsTruncate {

  private val raw = options.getBoolean("raw", false)
  private val gzip = options.getOrDefault("compression", "none") match {
    case "none" => false
    case "gzip" => true
    case other => throw new IllegalArgumentException(
      s"edn write: unsupported compression '$other' (none | gzip)")
  }

  override def truncate(): WriteBuilder = {
    val p = new Path(dir)
    // session Hadoop conf, not a default one — a default Configuration
    // has no object-store credentials/filesystem bindings
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    this
  }

  override def build(): Write = {
    if (raw && !(schema.fields.length == 1 && schema.fields(0).dataType == StringType))
      throw new IllegalArgumentException(
        s"edn raw write expects exactly one string column, got ${schema.simpleString}")
    new Write {
      override def toBatch: BatchWrite = new EdnBatchWrite(schema, dir, raw, gzip)
    }
  }
}

final class EdnBatchWrite(schema: StructType, dir: String, raw: Boolean,
    gzip: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    val p = new Path(dir)
    p.getFileSystem(conf.value).mkdirs(p)
    new EdnWriterFactory(schema, dir, raw, gzip, conf)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class EdnWriterFactory(schema: StructType, dir: String, raw: Boolean,
    gzip: Boolean, conf: SerializableConfiguration) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new EdnDataWriter(schema, dir, raw, gzip, partitionId, taskId, conf.value)
}

final case class EdnCommit(partitionId: Int, rows: Long) extends WriterCommitMessage

final class EdnDataWriter(schema: StructType, dir: String, raw: Boolean,
    gzip: Boolean, partitionId: Int, taskId: Long,
    hadoopConf: org.apache.hadoop.conf.Configuration) extends DataWriter[InternalRow] {

  // `.edn.gz` destinations round-trip through the scan side's
  // extension-based codec detection
  private val ext = if (gzip) ".edn.gz" else ".edn"
  private val fs = new Path(dir).getFileSystem(hadoopConf)
  private val tmp = new Path(dir, f".part-$partitionId%05d-attempt-$taskId$ext.tmp")
  private val dest = new Path(dir, f"part-$partitionId%05d$ext")
  private val out = {
    val base: java.io.OutputStream = fs.create(tmp, true)
    val stream = if (gzip) new java.util.zip.GZIPOutputStream(base) else base
    new java.io.PrintWriter(new java.io.OutputStreamWriter(
      stream, java.nio.charset.StandardCharsets.UTF_8))
  }
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    if (raw) out.println(row.getUTF8String(0).toString)
    else out.println(render(row))
    rows += 1
  }

  private def render(row: InternalRow): String = {
    val sb = new StringBuilder("{")
    var first = true
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        if (!first) sb ++= ", "
        first = false
        sb ++= ":" + f.name + " "
        f.dataType match {
          case LongType => sb ++= row.getLong(i).toString
          case IntegerType => sb ++= row.getInt(i).toString
          case DoubleType => sb ++= row.getDouble(i).toString
          case BooleanType => sb ++= row.getBoolean(i).toString
          case StringType => sb ++= "\"" + Edn.escape(row.getUTF8String(i).toString) + "\""
          case other => throw new IllegalArgumentException(s"edn write: unsupported type $other")
        }
      }
    }
    sb += '}'
    sb.toString
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (fs.exists(dest)) fs.delete(dest, false) // leftover from a dead job
    if (!fs.rename(tmp, dest))
      throw new java.io.IOException(s"edn write: rename $tmp -> $dest failed")
    EdnCommit(partitionId, rows)
  }
  override def abort(): Unit = { out.close(); fs.delete(tmp, false); () }
  override def close(): Unit = out.close()
}
