package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.{col, min, min_by, sort_array, struct, collect_list, transform => arrTransform}
import graft.edn.Edn
import graft.edn.Edn._
import graft.model.Mbrainz
import graft.model.Mbrainz._
import graft.ops.{Batching, EdnRender, GlobalIndex, Transform}
import graft.sources.EdnSource

/** E1 — the batcher pipeline (reference
  * `src/datomic/mbrainz/importer/batch.clj:10-20` +
  * `create-batch-file`, importer.clj:279-296):
  * entity EDN → validate/transform → tx-data → size-N batches →
  * one EDN line per batch in `<outDir>/<type>.edn`.
  *
  * The reference's channel+transducer wiring maps to a single Spark
  * job per type: narrow transform chain (whole-stage codegen) + one
  * shuffle for batch grouping (+ one for media assembly). Dictionary
  * types (schema/enums/super-enums, ≤ 8k rows) are driver-side like
  * the reference's in-memory `threaded-onto` (importer.clj:252-255).
  */
final class Batcher(spark: SparkSession, basedir: String, val outDir: String, batchSize: Int = 100) {

  private val entitiesDir = s"$basedir/entities"
  lazy val dims: Transform.Dims = Transform.Dims.load(spark, entitiesDir)
  new java.io.File(outDir).mkdirs()

  /** Skips types whose entity file is absent (e.g. the stripped
    * media.edn, `.MISSING_LARGE_BLOBS`) — dictionary-derived types
    * (schema/enums/super-enums) are checked against their own files. */
  def runAll(types: Seq[String] = Mbrainz.importOrder): Map[String, Long] =
    types.flatMap { t =>
      val file = t match {
        case "enums" => "enums.edn"
        case "super-enums" => "countries.edn"
        case other => s"$other.edn"
      }
      if (new java.io.File(s"$entitiesDir/$file").exists()) Some(t -> createBatchFile(t))
      else None
    }.toMap

  /** Returns the number of batches written for `tpe`. */
  def createBatchFile(tpe: String): Long = tpe match {
    case "schema" =>
      val forms = Edn.parse(EdnSource.readText(s"$entitiesDir/schema.edn")) match {
        case EVec(items) => items
        case other => throw new IllegalArgumentException(s"schema.edn not a vector: $other")
      }
      driverBatches(tpe, forms.map(Edn.print))
    case "enums" =>
      val txs = EdnSource.readEnums(s"$entitiesDir/enums.edn").map { case (_, in, ident) =>
        val ns = ident.substring(0, ident.indexOf('/'))
        "{:db/ident :" + ident + ", :" + ns + "/name \"" + Edn.escape(in) + "\"}"
      }
      driverBatches(tpe, txs)
    case "super-enums" =>
      val txs = Seq("countries", "langs", "scripts").flatMap { d =>
        EdnSource.readSuperEnum(s"$entitiesDir/$d.edn").map { case (_, _, ent) => Edn.print(ent) }
      }
      driverBatches(tpe, txs)
    case "media" => mediaBatchFile()
    case name =>
      val t = Mbrainz.byName(name)
      val raw = EdnSource.readEntities(spark, s"$entitiesDir/$name.edn", t)
      val transformed = Transform.requireStrict(Transform.transform(raw, t, dims), t)
      val mappings = t.mappings
      val rendered = transformed.map { row =>
        (row.getLong(row.fieldIndex("row_idx")), EdnRender.renderEntity(row, mappings))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING)).toDF("row_idx", "edn")
      writeType(name, rendered)
  }

  /** Media assembly (A1, importer.clj:236-247): contiguous rows sharing
    * `:id` form one medium; medium attrs come from the group's first
    * row; tracks carry a composite tempid so multi-artist tracks
    * coalesce; the reference `conj`s onto a list, so track order is
    * REVERSED input order — reproduced here via a descending sort. */
  private def mediaBatchFile(): Long = {
    val t = Mbrainz.media
    val raw = EdnSource.readEntities(spark, s"$entitiesDir/media.edn", t)
    val transformed = Transform.requireStrict(
      Transform.transform(raw, t, dims, keepCols = Seq("id")), t, keepCols = Seq("id"))
    val mediumMappings = Mbrainz.mediumMappings
    val trackMappings = Mbrainz.trackMappings
    val tracknumCol = Mbrainz.colName("track/position")
    val perRow = transformed.map { row =>
      val id = if (row.isNullAt(row.fieldIndex("id"))) "" else row.getLong(row.fieldIndex("id")).toString
      val tn = if (row.isNullAt(row.fieldIndex(tracknumCol))) "" else row.get(row.fieldIndex(tracknumCol)).toString
      val tempid = ":db/id \"track-" + id + "-" + tn + "\""
      ( if (id.isEmpty) -1L else id.toLong,
        row.getLong(row.fieldIndex("row_idx")),
        EdnRender.renderEntity(row, mediumMappings),
        EdnRender.renderEntity(row, trackMappings, extra = Seq(tempid)))
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING, Encoders.STRING))
      .toDF("id", "row_idx", "medium_edn", "track_edn")

    val assembled = perRow
      .groupBy(col("id"))
      .agg(
        min(col("row_idx")).as("medium_idx"),
        min_by(col("medium_edn"), col("row_idx")).as("medium_edn"),
        sort_array(collect_list(struct(col("row_idx"), col("track_edn"))), asc = false).as("tracks"))
      .select(col("medium_idx"),
        col("medium_edn"), arrTransform(col("tracks"), x => x.getField("track_edn")).as("track_edns"))

    val rendered = GlobalIndex.withDenseIndex(assembled, Seq(col("medium_idx")))
      .map { row =>
        val body = row.getString(row.fieldIndex("medium_edn"))
        val tracks = row.getSeq[String](row.fieldIndex("track_edns"))
        val tracksEdn = ":medium/tracks [" + tracks.mkString(" ") + "]"
        val full =
          if (body == "{}") "{" + tracksEdn + "}"
          else body.dropRight(1) + ", " + tracksEdn + "}"
        (row.getLong(row.fieldIndex("row_idx")), full)
      }(Encoders.tuple(Encoders.scalaLong, Encoders.STRING)).toDF("row_idx", "edn")
    writeType("media", rendered)
  }

  private def driverBatches(tpe: String, ednForms: Seq[String]): Long = {
    val lines = ednForms.grouped(batchSize).zipWithIndex.map { case (group, i) =>
      EdnRender.batchLine(Mbrainz.batchIdAttr, s"$tpe-${i + 1}", group)
    }.toSeq
    val w = new java.io.PrintWriter(new java.io.File(s"$outDir/$tpe.edn"), "UTF-8")
    try lines.foreach(w.println)
    finally w.close()
    lines.size.toLong
  }

  private def writeType(tpe: String, rendered: DataFrame): Long = {
    val lines = Batching.batchLines(rendered, batchSize, tpe, Mbrainz.batchIdAttr)
    Batching.writeLines(lines, s"$outDir/$tpe.edn")
  }
}
