package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables._

/** Multimodal column handling: media payloads are opaque `binary`
  * columns with typed metadata structs; decode / feature-extraction
  * runs batched per partition (the Spark-side plumbing — schema,
  * partitioning, batch shape — is real; the codec itself is a STUB
  * because no image/audio libraries exist in this container).
  *
  * The testdata has no true media files, so the payload is the
  * document text encoded as bytes — every byte-level operator below
  * treats it as an opaque blob, exactly as it would a JPEG.
  */
object Multimodal {

  /** Binary payload + metadata struct projection; all scan-side
    * expressions. This is the ingest shape for a 100 TB media corpus:
    * payload stays an opaque column (parquet keeps it out of the way
    * of column pruning), metadata is a narrow struct you can filter on
    * without touching bytes. */
  def mm1_binary_meta(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"),
        struct(
          lit("application/octet-stream").as("mime"),
          (col("n_chars") % 640).cast("long").as("width"),
          (col("doc_id") % 480).cast("long").as("height")).as("meta"))

  /** Feature-extraction over binary payloads via batched partition
    * iteration — the `mapInPandas` shape in Scala: rows are processed
    * in bounded batches (here 32) so a real codec would amortize
    * per-batch setup (model load, GPU transfer). The decode itself is
    * a deterministic FAKE (byte statistics standing in for pixel
    * statistics) — swap `decodeStub` for a real codec binding. */
  def mm2_decode_features(s: SparkSession, d: String): DataFrame = {
    val src = documents(s, d)
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("byte_mean", DoubleType, nullable = false),
      StructField("byte_transitions", LongType, nullable = false),
      StructField("n_bytes", LongType, nullable = false)))
    val batchSize = 32
    val rdd = src.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // STUB: a real implementation hands `batch` to a codec in one
        // call; these byte statistics are the deterministic stand-in.
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          Row(id, decodeStub(bytes)._1, decodeStub(bytes)._2, bytes.length.toLong)
        }
      }
    }
    s.createDataFrame(rdd, outSchema)
  }

  /** Deterministic fake decode: (mean byte value, count of adjacent
    * deltas > 16). */
  private[graft] def decodeStub(bytes: Array[Byte]): (Double, Long) = {
    if (bytes.isEmpty) return (0.0, 0L)
    var sum = 0L; var trans = 0L; var i = 0
    while (i < bytes.length) {
      sum += bytes(i) & 0xff
      if (i > 0 && math.abs((bytes(i) & 0xff) - (bytes(i - 1) & 0xff)) > 16) trans += 1
      i += 1
    }
    (sum.toDouble / bytes.length, trans)
  }

  /** Deterministic frame-sampling shape: every k-th fixed-size slice of
    * the payload becomes a "frame" row (posexplode of byte slices) —
    * the video-frame-sample plumbing without a video codec. */
  def mm3_frame_sample(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("payload", col("text").cast("binary"))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, cast(greatest(length(payload)-32, 0) / 64 as int)), i -> substring(payload, i*64+1, 32))"))
          .as(Seq("frame_idx", "frame_bytes")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame_bytes")).as("frame_md5"),
        length(col("frame_bytes")).cast("long").as("frame_len"))
}
