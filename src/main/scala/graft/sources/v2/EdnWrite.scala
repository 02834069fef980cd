package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import graft.edn.Edn

/** Batch write side of the "edn" connector: each partition writes one
  * EDN text file (`part-NNNNN.edn`, one map form per row, nulls
  * omitted) — the distributed form of the reference's EDN sink
  * (`src/cognitect/xform/async_edn.clj:66-82`). Ordered single-file
  * output (the golden-batch shape) remains `Batching.writeLines`;
  * this is the scale path where the consumer accepts a directory. */
final class EdnWriteBuilder(schema: StructType, dir: String) extends WriteBuilder
    with SupportsTruncate {
  override def truncate(): WriteBuilder = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir))
    this
  }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new EdnBatchWrite(schema, dir)
  }
}

final class EdnBatchWrite(schema: StructType, dir: String) extends BatchWrite {
  new java.io.File(dir).mkdirs()
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new EdnWriterFactory(schema, dir)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final class EdnWriterFactory(schema: StructType, dir: String) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new EdnDataWriter(schema, dir, partitionId)
}

final case class EdnCommit(partitionId: Int, rows: Long) extends WriterCommitMessage

final class EdnDataWriter(schema: StructType, dir: String, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val file = new java.io.File(dir, f"part-$partitionId%05d.edn")
  private val out = new java.io.PrintWriter(file, "UTF-8")
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
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
    out.println(sb.toString)
    rows += 1
  }

  override def commit(): WriterCommitMessage = { out.close(); EdnCommit(partitionId, rows) }
  override def abort(): Unit = { out.close(); file.delete(); () }
  override def close(): Unit = out.close()
}
