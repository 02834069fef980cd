package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `tx-data->batches` (reference `src/cognitect/xform/batch.clj:31-40`):
  * partition a dense-indexed stream into fixed-size batches with
  * monotonically numbered batch ids `prefix-N` (N from 1).
  *
  * Fully declarative (groupBy + collect_list + codegen'd string
  * assembly — no UDF): batch membership is `row_idx / size`, so the
  * grouping is a plain hash shuffle that scales with data, and in-batch
  * order is restored by `sort_array` on the carried index.
  */
object Batching {

  /** df must have (row_idx: dense 0-based long, edn: string).
    * Returns (batch_n, batch_id, line) — one EDN line per batch. */
  def batchLines(df: DataFrame, batchSize: Int, prefix: String, batchIdAttr: String): DataFrame =
    df.withColumn("batch_n", (col("row_idx") / batchSize).cast("long"))
      .groupBy(col("batch_n"))
      .agg(sort_array(collect_list(struct(col("row_idx"), col("edn")))).as("items"))
      .withColumn("batch_id", concat(lit(prefix + "-"), (col("batch_n") + 1).cast("string")))
      .select(
        col("batch_n"),
        col("batch_id"),
        concat(
          lit("{:batch-ident {:db/id \"datomic.tx\", :" + batchIdAttr + " \""),
          col("batch_id"),
          lit("\"}, :data ["),
          concat_ws(" ", transform(col("items"), x => x.getField("edn"))),
          lit("]}")).as("line"))

  /** Structured batch table for the loader path: (batch_n, batch_id,
    * data: array<string>) — parquet-friendly, distributed. */
  def batchTable(df: DataFrame, batchSize: Int, prefix: String): DataFrame =
    df.withColumn("batch_n", (col("row_idx") / batchSize).cast("long"))
      .groupBy(col("batch_n"))
      .agg(sort_array(collect_list(struct(col("row_idx"), col("edn")))).as("items"))
      .select(
        col("batch_n"),
        concat(lit(prefix + "-"), (col("batch_n") + 1).cast("string")).as("batch_id"),
        transform(col("items"), x => x.getField("edn")).as("data"))

  /** Driver-side write of the ordered batch file (the reference's
    * single-EDN-file sink, async_edn.clj:66-82). Batch files are
    * bounded (metadata-scale); entity payload stays distributed until
    * here. Returns the number of batches written. */
  def writeLines(lines: DataFrame, path: String): Long = {
    val ordered = lines.orderBy(col("batch_n")).select(col("line")).collect()
    val w = new java.io.PrintWriter(new java.io.File(path), "UTF-8")
    try ordered.foreach(r => w.println(r.getString(0)))
    finally w.close()
    ordered.length.toLong
  }
}
