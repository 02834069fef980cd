package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Mbrainz, SchemaRegistry}
import graft.store.{Datoms, Store}

/** Row shape of the EAV log (matches Store.schema column names). */
final case class DatomRow(e: String, a: String, v: String, v_long: Option[Long],
    is_ref: Boolean, tx: Long)

/** E2 — the loader pipeline (reference `-main`/`load-type`,
  * importer.clj:298-352): batch EDN → anti-join already-applied →
  * transact into the store → fold `{txes, datoms}` metrics.
  *
  * Spark shape per type: distributed line parse (one batch per line →
  * `spark.read.text` splits cleanly), `left_anti` against the applied
  * set (J5), datom expansion on executors, ONE append to the EAV log
  * wrapped in retry/backoff. The reference's `pipeline-blocking n`
  * bounded parallelism maps to `repartition(concurrency)` on the
  * write; per-batch transactional conflicts can't arise because the
  * whole type-load is a single atomic append (conflict-as-success,
  * batch.clj:97-101, degenerates to the anti-join).
  * Types stay sequential — FK/upsert dependencies (importer.clj:343-348).
  */
final class Loader(spark: SparkSession, registry: SchemaRegistry, store: Store,
    concurrency: Int = 8,
    attrPreds: Map[String, Seq[(String, org.apache.spark.sql.Column)]] = Map.empty) {

  /** `rejected` counts datoms dropped by `:db.attr/preds` (0 when no
    * predicates are declared). */
  final case class LoadStats(txes: Long, datoms: Long, rejected: Long = 0L)

  def loadBatchFile(tpe: String, path: String): LoadStats = {
    val typeIdx = math.max(Mbrainz.importOrder.indexOf(tpe), 0)
    val reg = registry
    val lines = spark.read.textFile(path).filter(length(trim(col("value"))) > 0)

    val applied = store.appliedBatchIds
    // Cheap batch-id extraction BEFORE the anti-join: the batcher
    // renders a canonical `{:batch-ident {:db/id "datomic.tx", :attr
    // "id"}, ...` prefix, so a regex reads the id without parsing the
    // batch EDN at all — already-applied batches are never parsed on
    // resume, and fresh batches parse exactly once (below). Non-
    // canonical lines fall back to the full parse.
    val prefixRe = ("^\\{:batch-ident \\{:db/id \"datomic.tx\", :" +
      java.util.regex.Pattern.quote(Mbrainz.batchIdAttr) + " \"([^\"]+)\"").r
    val parsed = lines.map { line =>
      val batchId = prefixRe.findFirstMatchIn(line).map(_.group(1))
        .getOrElse(Datoms.batchDatoms(line, reg, typeIdx)._1)
      (batchId, line)
    }(Encoders.tuple(Encoders.STRING, Encoders.STRING)).toDF("batch_id", "line")

    val fresh = parsed.join(applied, Seq("batch_id"), "left_anti")
      .repartition(concurrency)
      .persist()
    try {
      val txes = fresh.count()
      if (txes == 0) return LoadStats(0, 0)

      // `:db/txInstant` — one wall-clock datom per transaction entity
      // (Datomic's transactor stamps exactly this). Captured ONCE on
      // the driver so every batch of this load shares an instant and
      // reruns of the same executor task emit identical rows.
      val loadedAtMs = System.currentTimeMillis()
      val loadedAtIso = java.time.Instant.ofEpochMilli(loadedAtMs).toString
      val datoms = fresh.select("line").as(Encoders.STRING).flatMap { line =>
        val (batchId, ds) = Datoms.batchDatoms(line, reg, typeIdx)
        ds.map(d => DatomRow(d.e, d.a, d.v, d.vLong, d.isRef, d.tx)) :+
          DatomRow(s"tx|$batchId", Store.txInstantAttr, loadedAtIso,
            Some(loadedAtMs), is_ref = false, ds.head.tx)
      }(Encoders.product[DatomRow])
        .toDF()
        .persist()
      // `:db.attr/preds` enforcement point (Datomic validates attr
      // preds on every assert at transact time): rejected datoms are
      // counted and kept OUT of the log; the accepted set appends.
      // Retractions pass unchecked (attrPreds' own rule) — moot here,
      // the batcher emits asserts only.
      val annotated =
        if (attrPreds.isEmpty) datoms.withColumn("errors", array().cast("array<string>"))
        else graft.ops.Validate.attrPreds(datoms, attrPreds)
      val accepted = annotated.filter(size(col("errors")) === 0).drop("errors")
      val nDatoms = accepted.count()
      val nRejected =
        if (attrPreds.isEmpty) 0L
        else annotated.filter(size(col("errors")) > 0).count()
      Retry.retrying(() => { store.append(accepted); () }, Retry.transientIo)
      datoms.unpersist()
      LoadStats(txes, nDatoms, nRejected)
    } finally { fresh.unpersist(); () }
  }

  /** The import-schema the reference transacts before any data
    * (importer.clj:271-277): the batch-id attribute itself. Loaded
    * through the normal batch machinery, so it is idempotent via the
    * same anti-join. */
  def ensureImportSchema(): LoadStats = {
    val line =
      "{:batch-ident {:db/id \"datomic.tx\", :" + Mbrainz.batchIdAttr +
        " \"import-schema-1\"}, :data [" +
        "{:db/ident :" + Mbrainz.batchIdAttr + ", " +
        ":db/valueType :db.type/string, :db/cardinality :db.cardinality/one, " +
        ":db/unique :db.unique/value, " +
        ":db/doc \"Identifies batches from the initial import\"}]}"
    val f = java.nio.file.Files.createTempFile("import-schema", ".edn")
    java.nio.file.Files.write(f, line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try loadBatchFile("import-schema", f.toString)
    finally java.nio.file.Files.delete(f)
  }

  /** Sequential import order over a directory of batch files. */
  def loadAll(batchesDir: String, types: Seq[String] = Mbrainz.importOrder): Map[String, LoadStats] = {
    ensureImportSchema()
    types.flatMap { tpe =>
      val f = new java.io.File(s"$batchesDir/$tpe.edn")
      if (f.exists()) Some(tpe -> loadBatchFile(tpe, f.getPath)) else None
    }.toMap
  }
}
