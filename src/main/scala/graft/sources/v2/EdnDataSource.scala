package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.edn.Edn
import graft.edn.Edn._

/** DataSource V2 for EDN entity files: `spark.read.format("edn")
  * .schema(s).load(path1, path2, ...)`.
  *
  * Replaces the driver-side parse (EdnSource.readEntities) with a real
  * connector: one input partition per file (EDN forms can span lines,
  * so a file is the natural split unit — a 100 TB corpus is many
  * files), streaming form-at-a-time parse on executors (the
  * reference's bounded-memory reader semantics,
  * `src/cognitect/xform/async_edn.clj:27-51`), and COLUMN PRUNING
  * pushed into the parse — unrequested keys are never converted.
  *
  * The virtual `row_idx` column carries file order:
  * (fileOrdinal << 40) | formOrdinal — dense 0-based for a single
  * file, totally ordered across a corpus.
  */
class EdnDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "edn"
  override def supportsExternalMetadata(): Boolean = true

  /** Schema must be supplied (declared, never inferred — SURVEY §1.3);
    * inference would force a full pre-scan. */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "edn source requires an explicit schema: spark.read.format(\"edn\").schema(...)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EdnTable(schema, EdnDataSource.paths(properties))
}

object EdnDataSource {
  private[v2] def paths(properties: util.Map[String, String]): Seq[String] = {
    val p = Option(properties.get("paths"))
      .map { json => // Spark encodes multi-path load() as a JSON array
        json.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
      }
      .getOrElse(Option(properties.get("path")).toSeq)
    if (p.isEmpty) throw new IllegalArgumentException("edn source requires a path")
    p
  }
}

final class EdnTable(schema: StructType, paths: Seq[String])
    extends Table with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"edn(${paths.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EdnScanBuilder(schema, paths)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new EdnWriteBuilder(info.schema(), paths.head)
}

final class EdnScanBuilder(fullSchema: StructType, paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new EdnScan(required, paths)
}

final class EdnScan(required: StructType, paths: Seq[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"EdnScan readSchema=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    paths.zipWithIndex.map { case (p, i) => EdnFilePartition(p, i): InputPartition }.toArray
  override def createReaderFactory(): PartitionReaderFactory = new EdnReaderFactory(required)
}

final case class EdnFilePartition(path: String, fileIdx: Int) extends InputPartition

final class EdnReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EdnFilePartition]
    new EdnPartitionReader(p.path, p.fileIdx, required)
  }
}

final class EdnPartitionReader(path: String, fileIdx: Int, required: StructType)
    extends PartitionReader[InternalRow] {

  private val text = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
    java.nio.charset.StandardCharsets.UTF_8)
  private val parser = new Edn.Parser(text)
  private var i = -1L
  private var row: InternalRow = _

  override def next(): Boolean = parser.nextForm() match {
    case Some(form) =>
      i += 1
      row = convert(form)
      true
    case None => false
  }

  private def convert(form: Edn): InternalRow = {
    val m = form match {
      case em: EMap => em
      case other => throw new IllegalArgumentException(s"expected map form, got: $other")
    }
    val values = required.fields.map { f =>
      if (f.name == "row_idx") (fileIdx.toLong << 40) | i
      else m.getKw(f.name).map(v => toCatalyst(v, f.dataType)).orNull
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def toCatalyst(v: Edn, dt: DataType): Any = (v, dt) match {
    case (ENil, _) => null
    case (ELong(l), LongType) => l
    case (ELong(l), StringType) => UTF8String.fromString(l.toString)
    case (EStr(s), StringType) => UTF8String.fromString(s)
    case (EUuid(u), StringType) => UTF8String.fromString(u)
    case (k: EKw, StringType) => UTF8String.fromString(k.qualified)
    case (EDouble(d), DoubleType) => d
    case (EBool(b), BooleanType) => b
    case (other, StringType) => UTF8String.fromString(Edn.print(other))
    case (other, t) =>
      throw new IllegalArgumentException(s"cannot convert $other to $t")
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
