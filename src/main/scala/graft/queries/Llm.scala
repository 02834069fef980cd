package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables._

/** Large-scale training-data pipeline operators over `documents` /
  * `embeddings` (the extension surface beyond the reference — see the
  * builder brief and SURVEY §7.7). Everything is expression-level
  * (codegen'd, no UDFs): shingling, minhashing, simhashing, and
  * cosine distances are built from higher-order array functions, so
  * the hot paths stay inside whole-stage codegen and scale with
  * partitioning, not driver memory.
  *
  * Scale notes, per operator, live on the methods. The common theme:
  * never materialize all-pairs — dedup/similarity candidates come from
  * hash buckets (LSH bands, simhash chunks, hyperplane codes), so the
  * join key is the bucket and the shuffle is proportional to data,
  * not to data². */
object Llm {

  // ── d01: exact dedup (hash-groupBy) ────────────────────────────────
  /** One shuffle on the content hash; canonical doc = min id. At 100 TB
    * this is the classic first dedup pass; md5 collisions are
    * negligible and the hash is computed scan-side. */
  def d01_exact_dedup(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  // ── d02: MinHash signatures + LSH banding ──────────────────────────
  /** 5-char shingles → 32 minhashes → 8 bands of 4 (collision prob ≈
    * sim⁴ per band, so candidate volume stays near-linear even on a
    * homogeneous corpus). Signatures come from the native codegen'd
    * `minhash_sig` expression (graft.functions) — the higher-order-
    * function formulation it replaced evaluated interpreted and
    * re-inlined the shingle array into every lambda (HashExprsSpec
    * pins bit-equivalence). The explicit repartition spreads the
    * single-file scan; only the band table shuffles. */
  private def withMinhash(df: DataFrame): DataFrame = {
    graft.functions.HashExprs.register(df.sparkSession)
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .withColumn("minhash", expr("minhash_sig(text)"))
  }

  def d02_minhash_signatures(s: SparkSession, d: String): DataFrame =
    withMinhash(documents(s, d))
      .select(col("doc_id"), col("minhash"),
        expr("transform(array(minhash), mh -> transform(sequence(0, 7), b -> xxhash64(b, concat_ws(',', slice(mh, b*4+1, 4)))))[0]")
          .as("band_hashes"))

  /** Candidate pairs = docs sharing ≥1 band bucket; estimated Jaccard =
    * fraction of matching minhash components. The bucket join is the
    * scale path: shuffle key (band, hash), never doc×doc. */
  def d03_minhash_lsh_pairs(s: SparkSession, d: String): DataFrame = {
    val sig = d02_minhash_signatures(s, d)
      .select(col("doc_id"), col("minhash"), posexplode(col("band_hashes")).as(Seq("band", "bh")))
    // true self-join (same plan aliased twice) so ReuseExchange
    // computes the signature pipeline ONCE; estimate BEFORE dedup so
    // the distinct shuffles (a, b, est) — never the signature arrays
    val joined = sig.as("x").join(sig.as("y"),
      col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
        col("x.doc_id") < col("y.doc_id"))
    joined
      .withColumn("est_jaccard", round(
        expr("aggregate(zip_with(x.minhash, y.minhash, (a, b) -> if(a = b, 1, 0)), 0, (acc, v) -> acc + v) / cast(32 as double)"),
        6))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"), col("est_jaccard"))
      .distinct()
  }

  /** The deduplicated corpus itself: keep only each hash group's
    * canonical (min-id) document — what a training pipeline actually
    * feeds downstream. */
  def d13_dedup_corpus(s: SparkSession, d: String): DataFrame = {
    val canon = documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    documents(s, d).withColumn("content_hash", md5(col("text")))
      .join(canon, Seq("content_hash", "doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  // ── d04: n-gram Jaccard verification of LSH candidates ─────────────
  /** Exact word-3-gram Jaccard, but ONLY on LSH candidates (classic
    * candidate-then-verify; the exact set intersection never runs
    * all-pairs). */
  def d04_ngram_jaccard(s: SparkSession, d: String): DataFrame = {
    val grams = documents(s, d).select(col("doc_id"),
      // let-bind the token array: without the single-element-array
      // wrapper the split() re-runs once per gram position
      expr("""transform(array(split(lower(text), '[^a-z0-9]+')), ws ->
              array_distinct(transform(sequence(1, greatest(size(ws)-2, 1)),
              i -> concat_ws(' ', slice(ws, i, 3)))))[0]""").as("grams"))
    val pairs = d03_minhash_lsh_pairs(s, d).select("a_id", "b_id")
    pairs
      .join(grams.select(col("doc_id").as("a_id"), col("grams").as("a_g")), "a_id")
      .join(grams.select(col("doc_id").as("b_id"), col("grams").as("b_g")), "b_id")
      .withColumn("inter", size(array_intersect(col("a_g"), col("b_g"))))
      .withColumn("uni", size(array_union(col("a_g"), col("b_g"))))
      .select(col("a_id"), col("b_id"),
        round(col("inter") / greatest(col("uni"), lit(1)), 6).as("jaccard"))
  }

  // ── d05: SimHash (64-bit) + hamming near-dup pairs ─────────────────
  /** Token-hash bit voting packed into one long; near-dup candidates
    * via the pigeonhole principle — hamming ≤ 3 ⇒ at least one of four
    * 16-bit chunks equal, so the join key is (chunk_idx, chunk). */
  def d05_simhash(s: SparkSession, d: String): DataFrame = {
    graft.functions.HashExprs.register(s)
    documents(s, d)
      .repartition(s.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .select(col("doc_id"), expr("simhash64(text)").as("simhash"))
  }

  def d06_simhash_pairs(s: SparkSession, d: String): DataFrame = {
    val sh = d05_simhash(s, d)
      .select(col("doc_id"), col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 3), c -> shiftright(simhash, c*16) & 65535)")).as(Seq("chunk_idx", "chunk")))
    val a = sh.select(col("chunk_idx"), col("chunk"), col("doc_id").as("a_id"), col("simhash").as("a_sh"))
    val b = sh.select(col("chunk_idx"), col("chunk"), col("doc_id").as("b_id"), col("simhash").as("b_sh"))
    a.join(b, Seq("chunk_idx", "chunk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_sh ^ b_sh)").as("hamming")).distinct()
      .filter(col("hamming") <= 16)
  }

  // ── d07: embedding cosine near-dup + brute-force ANN top-k ─────────
  private def withNorm(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .withColumn("vec", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("norm", expr("sqrt(aggregate(vec, cast(0 as double), (acc, x) -> acc + x * x))"))

  /** Brute-force exact top-k for a bounded query set (the correctness
    * baseline): broadcast the queries, stream the corpus once, rank
    * per query. Corpus side scales linearly; no corpus×corpus join. */
  def d07_cosine_topk(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(embeddings(s, d))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
    val scored = emb.filter(col("vec_id") >= 8)
      .join(broadcast(queries))
      .withColumn("cosine", expr(
        "aggregate(zip_with(vec, q_vec, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v) / (norm * q_norm)"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** LSH-bucketed ANN — the 100 TB path: 6 deterministic pseudo-random
    * hyperplanes (weight literals baked into the plan, zero per-row
    * hashing) map every vector to a 64-bucket code; neighbors are only
    * scored within the query's bucket. Recall is traded for a shuffle
    * keyed on the code instead of a broadcast of the whole corpus;
    * bucket count scales with the plane count, tuned to corpus size. */
  private def annPlane(p: Int): String = (0 until 64).map { i =>
    val h = (p * 131L + i + 7L) * 0x9E3779B97F4A7C15L
    val v = ((h >>> 17) % 1000L) / 1000.0 - 0.5
    s"${v}D"
  }.mkString("array(", ", ", ")")

  private def annCodeExpr: String = (0 until 6).map { p =>
    s"""if(aggregate(zip_with(vec, slice(${annPlane(p)}, 1, size(vec)), (x, w) -> x * w),
        cast(0 as double), (a, v) -> a + v) > 0, ${1 << p}, 0)"""
  }.mkString("(", " + ", ")")

  def d08_ann_lsh(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(embeddings(s, d)).withColumn("code", expr(annCodeExpr))
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("code"), col("vec_id").as("query_id"), col("vec").as("q_vec"), col("norm").as("q_norm"))
    val scored = emb.filter(col("vec_id") >= 8).join(queries, "code")
      .withColumn("cosine", expr(
        "aggregate(zip_with(vec, q_vec, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v) / (norm * q_norm)"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  // ── d09–d12: text analysis ─────────────────────────────────────────
  private def occurrences(c: Column, needle: String): Column =
    ((length(c) - length(replace(c, lit(needle), lit("")))) / needle.length).cast("long")

  /** Marker-token language scoring (n-gram heuristic shape; the
    * corpus vocabulary is synthetic so accuracy vs the `lang` column is
    * not meaningful — determinism and the operator shape are). */
  def d09_lang_id(s: SparkSession, d: String): DataFrame = {
    val t = lower(col("text"))
    val en = occurrences(t, " the ") + occurrences(t, " and ") + occurrences(t, " of ")
    val de = occurrences(t, " der ") + occurrences(t, " und ") + occurrences(t, " die ")
    val fr = occurrences(t, " le ") + occurrences(t, " et ") + occurrences(t, " la ")
    val es = occurrences(t, " el ") + occurrences(t, " y ") + occurrences(t, " de ")
    documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("score_en"), de.as("score_de"), fr.as("score_fr"), es.as("score_es"))
      .withColumn("predicted",
        when(col("score_en") >= col("score_de") && col("score_en") >= col("score_fr") && col("score_en") >= col("score_es"), "en")
          .when(col("score_de") >= col("score_fr") && col("score_de") >= col("score_es"), "de")
          .when(col("score_fr") >= col("score_es"), "fr")
          .otherwise("es"))
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio,
    * mean word length — single scan, all codegen'd. */
  def d10_quality_score(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("n_len", length(col("text")).cast("long"))
      .withColumn("n_punct", (length(col("text")) -
        length(regexp_replace(col("text"), "[\\p{Punct}]", ""))).cast("long"))
      .withColumn("words", expr("filter(split(lower(text), '[^a-z0-9]+'), w -> length(w) > 0)"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("n_stop", expr(
        "size(filter(words, w -> w in ('the', 'a', 'of', 'and', 'to', 'in')))").cast("long"))
      .select(
        col("doc_id"), col("n_len"), col("n_punct"), col("n_words"), col("n_stop"),
        round(col("n_punct") / greatest(col("n_len"), lit(1)), 6).as("punct_ratio"),
        round(col("n_stop") / greatest(col("n_words"), lit(1)), 6).as("stop_ratio"))

  /** Token counting: whitespace tokens + a BPE-ish estimate
    * (per-word ceil(len/4) subword pieces). */
  def d11_token_count(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("words", expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)"))
      .select(
        col("doc_id"),
        size(col("words")).cast("long").as("n_ws_tokens"),
        expr("aggregate(words, cast(0 as bigint), (acc, w) -> acc + cast(ceil(length(w) / 4.0) as bigint))")
          .as("n_bpe_est"))

  /** Document fingerprint: md5 over the normalized text (lowercase,
    * punctuation stripped, whitespace collapsed) — catches
    * formatting-only duplicates that d01 misses. */
  def d12_fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      md5(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
        .as("fingerprint"))

  /** Rolling-hash fingerprint (polynomial, mod 1e9+7 over normalized
    * bytes) via the native `rolling_hash64` expression — the cheap
    * streaming fingerprint shape (one pass, no buffer). */
  def d14_rolling_fingerprint(s: SparkSession, d: String): DataFrame = {
    graft.functions.HashExprs.register(s)
    documents(s, d).select(col("doc_id"), expr("rolling_hash64(text)").as("fingerprint"))
  }

  /** Embedding-cosine near-dup pairs over a deterministic sample
    * (vec_id % 10 = 0): exact all-pairs on the sample, threshold on
    * rounded cosine. The sample bound keeps exactness affordable; the
    * full-corpus path is the LSH-bucketed d08. */
  def d15_embedding_near_dup(s: SparkSession, d: String): DataFrame = {
    val emb = withNorm(embeddings(s, d)).filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("vec"), col("norm"))
    val a = emb.select(col("vec_id").as("a_id"), col("vec").as("a_vec"), col("norm").as("a_norm"))
    val b = emb.select(col("vec_id").as("b_id"), col("vec").as("b_vec"), col("norm").as("b_norm"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine", round(expr(
        "aggregate(zip_with(a_vec, b_vec, (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v) / (a_norm * b_norm)"), 6))
      .filter(col("cosine") >= 0.3)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }
}
