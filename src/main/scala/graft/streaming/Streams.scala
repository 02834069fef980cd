package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference pipeline is genuinely
  * streaming (bounded memory over arbitrary files, SURVEY §2.6) but has
  * no event-time semantics; this module supplies the streaming shapes a
  * production engine needs: watermarked windowed aggregation, session
  * windows, custom state (flatMapGroupsWithState), and an idempotent
  * foreachBatch sink that reuses the loader's ledger anti-join
  * semantics (exactly-once-ish resume, batch.clj:42-60).
  */
object Streams {

  /** events parquet schema, declared (never inferred — streaming
    * requires it anyway). On disk `ts` has shipped in two physical
    * forms (see Tables.events): TIMESTAMP(MICROS) NTZ since the
    * 2026-08-13 testdata regen, and legacy TIMESTAMP(NANOS) readable
    * only as epoch-nanos LongType under the nanosAsLong flag.
    * `readEvents` probes the actual file form (same probe the batch
    * reader uses) and normalizes either to the engine-wide epoch-NANOS
    * LongType convention, so streaming and batch consumers never
    * diverge on unit or physical form. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** The legacy physical form: ts already epoch-nanos LongType. */
  val eventSchemaNanosLong: StructType = StructType(
    eventSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = LongType) else f))

  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // footer probe via the batch opener — also turns the opaque
    // legacy-NANOS schema failure into the actionable nanosAsLong hint
    val onDisk = graft.sources.Tables.openEvents(spark, dir).schema
    if (onDisk("ts").dataType == LongType)
      spark.readStream.schema(eventSchemaNanosLong).parquet(dir) // already epoch nanos
    else {
      require(spark.conf.get("spark.sql.session.timeZone", "") == "UTC",
        "events.ts is TIMESTAMP_NTZ (interpreted as UTC): set " +
          "spark.sql.session.timeZone=UTC when building the SparkSession")
      spark.readStream.schema(eventSchema).parquet(dir)
        .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }

  /** Epoch-nanos → event-time timestamp column. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("ets", timestamp_micros(expr("ts div 1000")))

  /** Watermarked tumbling-window aggregate: late data beyond 1 hour is
    * dropped, state is bounded — the 100 TB streaming posture (state
    * size ∝ open windows × event types, not stream length). */
  def hourlyCounts(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ets", "1 hour")
      .groupBy(window(col("ets"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"), col("event_type"),
        col("n"), col("sum_value"))

  /** Built-in session windows (30-minute gap) per user. */
  def userSessions(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("ets", "1 hour")
      .groupBy(session_window(col("ets"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"),
        col("n_events"), col("sum_value"))

  /** Streaming exact-dedup on ingest: state is bounded by the
    * watermark (an id is only remembered while late duplicates can
    * still arrive) — the streaming form of d01's content-hash dedup,
    * keyed here on event_id + the dedup column of choice. */
  def dedupStream(events: DataFrame, idCols: Seq[String], lateness: String): DataFrame =
    withEventTime(events)
      .withWatermark("ets", lateness)
      .dropDuplicates(idCols :+ "ets")

  /** Dedup on the ID ALONE within the watermark window: a replayed
    * record whose timestamp drifted (retry after seconds, clock skew
    * between producers) still dedups — `dropDuplicates` above keys on
    * (id, ets) and would pass both copies through. State per id is
    * dropped once the watermark passes its first-seen time, so memory
    * stays bounded on an unbounded stream — this is the streaming
    * twin of d01 for at-least-once upstream delivery. */
  def dedupStreamById(events: DataFrame, idCols: Seq[String], lateness: String): DataFrame =
    withEventTime(events)
      .withWatermark("ets", lateness)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval join (click attribution): every click joins
    * the same user's impressions within the look-back horizon. BOTH
    * sides carry watermarks and the join condition is time-bounded, so
    * Spark can age state out on both sides — the shape that keeps a
    * stream-stream join's state finite on an unbounded stream. The two
    * inputs are usually the same source filtered twice; state is keyed
    * by user, so the shuffle is the join key, not the stream. */
  /** Attribution look-back, shared by the streaming join, its batch
    * twin (`Relational.q42_click_attribution`) and the DuckDB oracle —
    * one constant so the three can't drift apart. */
  val attributionHorizonUs: Long = 30L * 60 * 1000 * 1000
  val attributionHorizon: String = s"${attributionHorizonUs / 60000000L} minutes"

  def clickAttribution(events: DataFrame, horizon: String = attributionHorizon,
      lateness: String = "1 hour"): DataFrame = {
    val imps = withEventTime(events)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("i_user"), col("event_id").as("imp_id"),
        col("ets").as("imp_ts"))
      .withWatermark("imp_ts", lateness)
    val clicks = withEventTime(events)
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ets").as("click_ts"))
      .withWatermark("click_ts", lateness)
    clicks.join(imps,
      expr(s"user_id = i_user AND imp_ts <= click_ts AND imp_ts >= click_ts - interval $horizon"))
      .select(col("user_id"), col("click_id"), col("imp_id"),
        unix_millis(col("click_ts")).as("click_ms"),
        unix_millis(col("imp_ts")).as("imp_ms"))
  }

  // ── Custom state: hand-rolled sessionizer ──────────────────────────
  final case class Ev(user_id: Long, ts_ms: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** flatMapGroupsWithState sessionizer — the shape for session logic
    * the built-in window can't express (per-session custom predicates,
    * early emission, enrichment). Sessions close when a later event
    * arrives past the gap; state per user is O(1). */
  def statefulSessions(ds: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = events.toSeq.sortBy(_.ts_ms)
          val out = Seq.newBuilder[SessionOut]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_ms - s.last <= gapMs =>
                cur = Some(SessionState(s.start, e.ts_ms, s.n + 1, s.sum + e.value))
              case Some(s) =>
                out += SessionOut(user, s.start, s.last, s.n, s.sum)
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
              case None =>
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Idempotent foreachBatch sink: micro-batches land in a parquet
    * table partitioned by batch_id, written with DYNAMIC PARTITION
    * OVERWRITE, and are then ledgered — the streaming form of the
    * loader's anti-join resume. A ledgered batch id replays as a
    * no-op; a crash BETWEEN data write and ledger write replays as an
    * overwrite of that batch's own partition (idempotent, not
    * duplicating — the write-then-ledger gap is closed by making the
    * write itself a replace). */
  def idempotentParquetSink(df: DataFrame, outPath: String, ledgerPath: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        applyMicroBatch(batch.toDF(), batchId, outPath, ledgerPath); ()
      }
      .start()

  /** One micro-batch application; returns true if the batch was new.
    * Replays of an already-ledgered batch id are no-ops; replays of a
    * half-applied batch (crash before the ledger write) overwrite
    * exactly their own batch_id partition. */
  def applyMicroBatch(batch: DataFrame, batchId: Long, outPath: String,
      ledgerPath: String): Boolean = {
    val spark = batch.sparkSession
    val lp = new org.apache.hadoop.fs.Path(ledgerPath)
    val ledgerFs = lp.getFileSystem(spark.sessionState.newHadoopConf())
    val applied = ledgerFs.exists(lp) &&
      spark.read.parquet(ledgerPath).filter(col("batch_id") === batchId).count() > 0
    if (!applied) {
      batch.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(outPath)
      import spark.implicits._
      Seq(batchId).toDF("batch_id").write.mode("append").parquet(ledgerPath)
    }
    !applied
  }

  /** Streaming curation: the batch pipeline's map-only prefix
    * (`Curate.curatePrefix` — gopher gate → PII scrub → content hash →
    * token count, the EXACT Column expressions d38 runs) applied to a
    * document STREAM, then exact dedup ACROSS micro-batches keyed on
    * the 128-bit content hash. The incremental-ingest shape of a
    * training-data pipeline: documents arrive continuously, the gate
    * is stateless per-row, and the only state is the dedup hash set —
    * bounded by distinct clean content (at 100 TB: key the state on
    * the hash, never the text; add a watermark column +
    * dropDuplicatesWithinWatermark when the crawl horizon bounds how
    * late a duplicate can arrive, which truncates state by time). */
  def curateStream(docs: DataFrame): DataFrame =
    graft.queries.Curate.curatePrefix(docs)
      .dropDuplicates("clean_hash")

  // ── Streaming NEAR-dup dedup: cross-batch MinHash-LSH state ───────
  final case class BandHit(band: Int, bh: Long, doc_id: Long)
  final case class NearDupVerdict(doc_id: Long, band: Int, rep_doc: Long)

  /** Cross-batch NEAR-duplicate detection on a document stream — the
    * ingest-time analog of batch d03: each arriving doc's MinHash-LSH
    * band hashes (the same `lsh_bands` expression, so stream and
    * batch agree on candidates) key a flatMapGroupsWithState over
    * band-buckets whose state is the bucket's REPRESENTATIVE (the
    * first-ever doc to occupy it, min doc_id on a first-batch tie).
    * Every (doc, band) emits a verdict carrying that representative;
    * [[nearDupKeptOfBatch]] folds a micro-batch's verdicts per doc —
    * a doc is a near-dup iff ANY of its buckets was already owned by
    * an earlier doc. State is one long per occupied bucket (∝ corpus
    * distinct bands, NOT pairs), lives in the state store
    * (RocksDB-backed at scale), and never returns to the driver —
    * this is how a 100 TB ingest dedups against everything already
    * ingested without re-scanning it. `curateStream`'s exact-hash
    * dedup composes upstream (drop exact dups cheaply first). */
  def nearDupVerdictStream(docs: DataFrame): Dataset[NearDupVerdict] = {
    graft.functions.HashExprs.register(docs.sparkSession)
    import docs.sparkSession.implicits._
    docs
      .select(posexplode(expr("lsh_bands(text, 8)")).as(Seq("band", "bh")),
        col("doc_id").cast("long").as("doc_id"))
      .select(col("band").cast("int").as("band"), col("bh").cast("long").as("bh"),
        col("doc_id"))
      .as[BandHit]
      .groupByKey(h => (h.band, h.bh))
      .flatMapGroupsWithState[Long, NearDupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), hits: Iterator[BandHit], state: GroupState[Long]) =>
          val ids = hits.map(_.doc_id).toSeq.sorted
          val rep = state.getOption.getOrElse(ids.min)
          if (!state.exists) state.update(rep)
          ids.iterator.map(d => NearDupVerdict(d, key._1, rep))
      }
  }

  /** Fold one micro-batch of [[nearDupVerdictStream]] verdicts into
    * per-doc keep/drop decisions (use inside foreachBatch; a doc's
    * verdicts all land in its own micro-batch, so the fold is local
    * to the batch). `rep_doc` is the doc it duplicates (the smallest
    * representative across its bands) when `is_dup`. */
  def nearDupKeptOfBatch(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(min(col("rep_doc")).as("rep_doc"))
      .withColumn("is_dup", col("rep_doc") < col("doc_id"))

  // ── Trending n-grams: watermarked window census ───────────────────
  /** "What is the crawl saying RIGHT NOW" — per-event-time-window
    * trigram counts on a document stream, with the state problem
    * solved the idiomatic Structured-Streaming way: the census is a
    * watermarked windowed aggregate, so state holds only spans whose
    * window can still receive data (the watermark EXPIRES old
    * windows' state — bounded by the active horizon, not the stream's
    * lifetime) and append mode emits each window exactly once, when
    * it finalizes. No driver-side counting anywhere: counts are
    * partial-aggregated map-side, the state store shards by
    * (window, span). [[trendingTopkOfBatch]] ranks a finalized
    * batch's windows top-k — rows ∝ emitted windows, tiny. */
  def trendingSpans(docs: DataFrame, windowDur: String = "10 minutes",
      lateness: String = "10 minutes"): DataFrame = {
    graft.functions.HashExprs.register(docs.sparkSession)
    docs
      .select(col("ts"),
        explode(expr("word_ngrams(lower(text), 3)")).as("span"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur).as("win"), col("span"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("window_start"), col("span"), col("cnt"))
  }

  /** Rank one finalized micro-batch of [[trendingSpans]] output to the
    * top-k spans per window (count desc, span asc — total order). */
  def trendingTopkOfBatch(windows: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start")).orderBy(col("cnt").desc, col("span"))
    windows.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** One transaction's report — Datomic `tx-report-queue` entry shape:
    * the basis `t` and the transaction's datoms (full Store.schema
    * rows). A transaction larger than the queue's `maxDatomsPerReport`
    * is delivered as an ANOMALY report instead — `datoms` empty,
    * `anomaly` describing the overrun — so one pathological
    * multi-million-datom tx degrades to a pointer ("read tx N from the
    * log yourself") instead of materializing on the driver. */
  final case class TxReport(t: Long, datoms: Seq[org.apache.spark.sql.Row],
      anomaly: Option[String] = None)

  /** Handle on a running tx-report subscription. `close()` stops the
    * stream and then delivers the BOUNDARY transaction's report (the
    * max tx seen, whose completeness a later tx could no longer
    * prove — quiescence at close is the proof). */
  final class TxReportQueue(val query: org.apache.spark.sql.streaming.StreamingQuery,
      flush: () => Unit) {
    def processAllAvailable(): Unit = query.processAllAvailable()
    def close(): Unit = {
      query.stop(); query.awaitTermination(); flush()
    }
  }

  /** Stash-directory listing shared by both tx-report modes.
    * `Files.list` returns a stream holding an open directory FD and
    * this runs ~3x per trigger — close it eagerly, or a long-lived
    * subscription leaks one FD per call until GC. */
  private def listStashIds(stashRoot: java.nio.file.Path): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    if (!java.nio.file.Files.isDirectory(stashRoot)) Seq.empty
    else {
      val s = java.nio.file.Files.list(stashRoot)
      try s.iterator().asScala
        .flatMap(p => scala.util.Try(p.getFileName.toString.toLong).toOption)
        .toSeq.sorted
      finally s.close()
    }
  }

  /** Recursive delete with the `Files.walk` stream closed before the
    * deletes run (same FD concern as [[listStashIds]]). */
  private def deleteStashDir(d: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(d)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }

  /** Datomic `d/tx-report-queue` analog — SUBSCRIBE to committed
    * transactions: a readStream over the store's append-only log
    * delivers every tx with `tx > basis` as ONE [[TxReport]], in tx
    * order, exactly once across restarts (the file-source checkpoint
    * remembers which log files were already delivered).
    *
    * COMPLETENESS: one `Store.append` commits a tx as MANY part files
    * (partitionBy("a") × input partitions), and a micro-batch boundary
    * (or a listing racing a concurrent commit) can split them across
    * triggers — so a tx's report is emitted only once a LATER tx
    * appears in the stream, which under the store's single-writer
    * append discipline proves every file of the earlier tx was already
    * listed. The max-tx group of each batch is HELD BACK in a stash
    * persisted under the checkpoint (`graft-tx-holdback/<batchId>`,
    * re-read by batchId on replay, so a crashed trigger resumes with
    * the same holdback instead of losing the partial tx); `close()`
    * flushes the final boundary tx. Consumers see at-least-once
    * per-trigger-failure semantics like any foreachBatch side effect —
    * dedupe by `t` if the callback is not idempotent.
    *
    * This closes the loop with [[datomStreamSink]]: that is the write
    * side (stream → store), this is the read side (store → stream) —
    * together they are Datomic's transactor pipeline in Spark terms.
    *
    * Scale: the stream's first pass discovers the existing log, but
    * the `tx > basis` filter is a pushed parquet predicate — old row
    * groups prune on tx min/max, so catching up on a 100 TB log reads
    * footers, not history. Per-trigger volume is bounded with
    * `maxFilesPerTrigger`; per-tx driver exposure is bounded by
    * `maxDatomsPerReport` (report assembly counts each tx
    * DISTRIBUTED-side first and only collects under-cap txes — an
    * over-cap tx never reaches the driver, see [[TxReport]]). */
  def txReportQueue(spark: SparkSession, store: graft.store.Store, basis: Long,
      maxFilesPerTrigger: Int = 1000, maxDatomsPerReport: Long = 1000000L)(
      checkpoint: String)(onReport: TxReport => Unit): TxReportQueue = {
    // THIN WRAPPER over [[txReportQueueToTable]] — the table mode is
    // the primary implementation (round-11 verdict ask): completed
    // txes' datoms are published executor-side into a report table
    // under the checkpoint, and the ONLY rows that ever reach the
    // driver are the under-cap reports this compatibility API's
    // callback contract requires — read back from the report
    // partition, bounded by `maxDatomsPerReport`, after the pointer
    // told us the count. The streaming internals (per-trigger
    // counting, boundary holdback, replay) no longer collect anything.
    val reportDir = s"$checkpoint/graft-tx-reports"
    val fields = graft.store.Store.schema.fieldNames.toSeq
    txReportQueueToTable(spark, store, basis, reportDir, maxFilesPerTrigger)(
      checkpoint) { ptr =>
      if (ptr.nDatoms > maxDatomsPerReport)
        onReport(TxReport(ptr.t, Seq.empty, Some(
          s"tx ${ptr.t} has ${ptr.nDatoms} datoms, over " +
            s"maxDatomsPerReport=$maxDatomsPerReport; read it from the " +
            s"report table (${ptr.path}) or the store log (tx = ${ptr.t}) instead")))
      else {
        val rows = spark.read.parquet(ptr.path)
          .withColumn("tx", lit(ptr.t))
          .select(fields.map(col): _*)
          .collect().toSeq
        onReport(TxReport(ptr.t, rows.sortBy(r =>
          (r.getAs[String]("e"), r.getAs[String]("a"), r.getAs[String]("v")))))
      }
    }
  }

  /** One completed transaction's POINTER — the no-driver-rows report:
    * basis `t`, its datom count, and the report-table partition
    * holding its datoms (`reportDir/tx=<t>`, full Store.schema). */
  final case class TxReportPointer(t: Long, nDatoms: Long, path: String)

  /** [[txReportQueue]] with the DRIVER REMOVED from the data path —
    * the deployment shape for large transactions: completed txes'
    * datoms are written EXECUTOR-SIDE into a report TABLE
    * (`reportDir`, partitioned by tx; dynamic partition overwrite
    * makes trigger replays idempotent), and the subscriber receives
    * only [[TxReportPointer]]s. No `maxDatomsPerReport` cap exists in
    * this mode because no datom ever reaches the driver — a
    * multi-M-datom tx streams straight from log scan to report
    * partition; the only driver traffic is the per-tx COUNT map
    * (bounded by txes-per-trigger, metadata scale) and the pointers.
    * The boundary-tx holdback stash is likewise written and merged as
    * DataFrames (never collected). Same completeness/ordering/replay
    * contract as [[txReportQueue]]. */
  def txReportQueueToTable(spark: SparkSession, store: graft.store.Store,
      basis: Long, reportDir: String, maxFilesPerTrigger: Int = 1000)(
      checkpoint: String)(onReport: TxReportPointer => Unit): TxReportQueue = {
    import java.nio.file.{Files, Paths}
    val stashRoot = Paths.get(checkpoint, "graft-tx-holdback")
    def stashIds(): Seq[Long] = listStashIds(stashRoot)
    def readMeta(id: Long): Option[(Long, Long)] = { // (tx, cnt)
      val m = stashRoot.resolve(s"$id/meta")
      if (!Files.exists(m)) None else {
        val parts = new String(Files.readAllBytes(m), "UTF-8").trim.split(" ")
        Some((parts(0).toLong, parts(1).toLong))
      }
    }
    def stashDf(id: Long): Option[org.apache.spark.sql.DataFrame] = {
      val p = stashRoot.resolve(s"$id/rows.parquet")
      if (!Files.exists(p)) None
      else Some(spark.read.schema(graft.store.Store.schema).parquet(p.toString))
    }
    def deleteStash(id: Long): Unit = deleteStashDir(stashRoot.resolve(s"$id"))
    // executor-side publish: append-by-overwrite of exactly the txes'
    // partitions (replay rewrites identical bytes — idempotent)
    def publish(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tx").parquet(reportDir)
    def pointer(t: Long, cnt: Long): Unit =
      onReport(TxReportPointer(t, cnt, s"$reportDir/tx=$t"))
    val q = spark.readStream.schema(graft.store.Store.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"${store.dir}/eav")
      .filter(col("tx") > basis)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (rawBatch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val batch = rawBatch.select(
          graft.store.Store.schema.fieldNames.toSeq.map(col): _*)
        val prevId = stashIds().filter(_ < batchId).lastOption
        val holdback = prevId.flatMap(readMeta)
        val counts = batch.groupBy(col("tx")).count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val totals = holdback.foldLeft(counts) { case (m, (htx, hcnt)) =>
          m.updated(htx, m.getOrElse(htx, 0L) + hcnt)
        }
        if (totals.nonEmpty) {
          val boundary = totals.keys.max
          val completes = totals.keys.filter(_ < boundary).toSeq.sorted
          if (completes.nonEmpty) {
            val fromBatch = batch.filter(col("tx").isin(completes: _*))
            val fromStash = holdback.toSeq.collect {
              case (htx, _) if htx < boundary => prevId.flatMap(stashDf)
            }.flatten
            publish(fromStash.foldLeft(fromBatch)(_ unionByName _))
            completes.foreach(t => pointer(t, totals(t)))
          }
          // stash the boundary tx for the next trigger — as a
          // DataFrame write, never a collect (overwrite on replay)
          deleteStash(batchId)
          Files.createDirectories(stashRoot.resolve(s"$batchId"))
          val bBatch = batch.filter(col("tx") === boundary)
          val bAll = holdback.toSeq.collect {
            case (htx, _) if htx == boundary => prevId.flatMap(stashDf)
          }.flatten.foldLeft(bBatch)(_ unionByName _)
          bAll.write.mode("overwrite")
            .parquet(stashRoot.resolve(s"$batchId/rows.parquet").toString)
          Files.write(stashRoot.resolve(s"$batchId/meta"),
            s"$boundary ${totals(boundary)}".getBytes("UTF-8"))
          stashIds().filter(id => id < prevId.getOrElse(batchId)).foreach(deleteStash)
        }
        ()
      }
      .start()
    new TxReportQueue(q, () => {
      stashIds().lastOption.foreach { id =>
        readMeta(id).foreach { case (t, cnt) =>
          stashDf(id).foreach(publish)
          pointer(t, cnt)
        }
      }
      stashIds().foreach(deleteStash)
    })
  }

  /** LIVE db-stats — the first consumer every tx-report subscriber
    * builds: a continuously-maintained per-attribute datom count over
    * the store, expressed as a plain streaming aggregation over the
    * log (no custom state code — Structured Streaming's complete-mode
    * aggregate IS the maintained view). `net_datoms` nets retractions
    * against asserts, `n_datoms` counts log rows. Registered as temp
    * view `viewName`, so `spark.table(viewName)` reads the CURRENT
    * stats at any moment while loads stream in. Memory sink = local
    * live view; a cluster deployment points the same aggregation at a
    * real sink. State is one row per attribute — bounded by schema
    * size, not log length. */
  def liveDbStats(spark: SparkSession, store: graft.store.Store, viewName: String)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(graft.store.Store.schema)
      .parquet(s"${store.dir}/eav")
      .groupBy(col("a"))
      .agg(count(lit(1)).as("n_datoms"),
        sum(when(col("op"), 1L).otherwise(-1L)).as("net_datoms"))
      .writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .format("memory").queryName(viewName)
      .start()

  /** Datomic `d/sync` analog: block until the store's basis-t reaches
    * `t`, then return it (callers then read `store.current` / `asOf`
    * at a basis they KNOW includes their own write — the
    * read-your-writes coordination `d/sync` exists for). Polls the
    * log's tx max (parquet column stats — no data pages); throws on
    * timeout like Datomic's deref. */
  def sync(store: graft.store.Store, t: Long, timeoutMs: Long = 30000L,
      pollMs: Long = 50L): Long = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var b = store.basisT
    while (b < t) {
      if (System.nanoTime() > deadline)
        throw new java.util.concurrent.TimeoutException(
          s"d/sync: basis $b has not reached $t within ${timeoutMs}ms")
      Thread.sleep(pollMs)
      b = store.basisT
    }
    b
  }

  /** Streaming datom ingestion: each micro-batch of (e, a, v[, v_long,
    * is_ref]) rows appends atomically to the EAV store with
    * tx = txBase + batchId, so the store is queryable — `current`,
    * `asOf`, `since`, Datalog — WHILE the stream runs, and every
    * micro-batch is its own time-travel horizon. Replayed batches
    * skip via a tx-presence probe: the log IS the ledger, the same
    * in-log idempotency the loader uses (batch.clj:42-60). */
  def datomStreamSink(datoms: DataFrame, store: graft.store.Store, txBase: Long)(
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    datoms.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val tx = txBase + batchId
        val applied = store.exists &&
          store.eav.filter(col("tx") === tx).limit(1).count() > 0
        if (!applied && !batch.isEmpty) {
          val full = Seq(
            "v_long" -> lit(null).cast("long"),
            "is_ref" -> lit(false)).foldLeft(batch.toDF()) { case (df, (c, d)) =>
            if (df.columns.contains(c)) df else df.withColumn(c, d)
          }
          store.append(full.withColumn("tx", lit(tx)))
        }
        ()
      }
      .start()
}
