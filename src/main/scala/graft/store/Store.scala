package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SchemaRegistry

/** Append-only EAV log on parquet + current-state view — the target
  * "database" (reference: Datomic Cloud; SURVEY §1.1 "entity graph").
  *
  * Scale posture: the log is append-only and partitioned by attribute
  * (`a`) — Datomic's AEVT analog — so attribute-filtered scans prune
  * partitions and loads never rewrite history (no read-modify-write of
  * a growing store; compaction is an offline concern). Idempotency
  * state (applied batch ids) lives IN the log as datoms on the tx
  * entity, exactly like the reference (`already-transacted`,
  * batch.clj:46-60) — there is no separate ledger to drift.
  */
final class Store(spark: SparkSession, val dir: String) {

  private val eavPath = s"$dir/eav"

  def exists: Boolean = new java.io.File(eavPath).exists()

  def eav: DataFrame =
    if (exists) spark.read.parquet(eavPath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Store.schema)

  def append(datoms: DataFrame): Unit =
    datoms.select(Store.schema.fieldNames.map(col): _*)
      .write.mode(SaveMode.Append).partitionBy("a").parquet(eavPath)

  /** Applied batch ids (J5 input): datoms asserting the batch-id attr. */
  def appliedBatchIds: DataFrame =
    eav.filter(col("a") === graft.model.Mbrainz.batchIdAttr)
      .select(col("v").as("batch_id")).distinct()

  /** Current-state view: card-many attrs accumulate (distinct union),
    * card-one attrs resolve last-writer-wins by tx — one shuffle,
    * grouped by (e, a). */
  def current(registry: SchemaRegistry): DataFrame = {
    val manyAttrs = registry.attrs.values.filter(_.many).map(_.ident).toSeq
    val one = eav.filter(!col("a").isInCollection(manyAttrs))
      .groupBy(col("e"), col("a"))
      .agg(max_by(struct(col("v"), col("v_long"), col("is_ref")), col("tx")).as("s"))
      .select(col("e"), col("a"), col("s.v").as("v"), col("s.v_long").as("v_long"),
        col("s.is_ref").as("is_ref"))
    val many = eav.filter(col("a").isInCollection(manyAttrs))
      .select(col("e"), col("a"), col("v"), col("v_long"), col("is_ref")).distinct()
    one.unionByName(many)
  }
}

object Store {
  import org.apache.spark.sql.types._
  val schema: StructType = StructType(Seq(
    StructField("e", StringType, nullable = false),
    StructField("a", StringType, nullable = false),
    StructField("v", StringType, nullable = false),
    StructField("v_long", LongType, nullable = true),
    StructField("is_ref", BooleanType, nullable = false),
    StructField("tx", LongType, nullable = false)))
}
