package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): learn a merge table
  * from the corpus by iterated pair counting, the missing half of the
  * tokenizer pipeline whose APPLICATION half is `bpe_count` /
  * `bpe_count_learned` (functions/BpeExprs.scala).
  *
  * Distributed shape — the standard split for BPE training at scale:
  *  - the only corpus-scale work is the WORD-FREQUENCY reduction (one
  *    shuffle ∝ corpus tokens, map-side combined); everything after
  *    operates on the weighted vocab, which Heaps' law keeps tiny
  *    relative to the corpus and `vocabCap` bounds outright
  *    (deterministic top-V by (freq DESC, word ASC) — the cap is the
  *    100 TB valve, and it is in the ORACLE too, so capping is part of
  *    the gated semantics, not a hidden approximation);
  *  - each training round is one pair-keyed aggregation over the vocab
  *    (explode adjacent symbol pairs, weight by word freq) plus a
  *    1-ROW argmax collect — never a corpus collect, never a corpus
  *    re-scan; rounds re-checkpoint the (≤ vocabCap)-row vocab so the
  *    plan does not grow with rounds;
  *  - cost model: one corpus pass + `rounds` × O(vocab) aggregations.
  *    A production tokenizer (30–50k merges) runs the same loop with
  *    more rounds; rounds scale the round count, data scales only the
  *    first pass.
  *
  * CROSS-ENGINE EXACTNESS (the d50/d52 oracle discipline): word states
  * are the same `<sym><sym>…` delimited strings the bpe_count oracle
  * uses; a pair's count within a word is its LEFTMOST-NON-OVERLAPPING
  * occurrence count — computable on both engines as
  * `(length(state) - length(replace(state, pair))) / length(pair)`,
  * which is also exactly the number of replacements `replace()` makes
  * when the merge is applied, so counting and merging can never
  * disagree. (Positional pair counting — the other published
  * convention — differs only on runs like "aaa", where replace
  * semantics count 1, not 2.) The best pair each round is
  * `ORDER BY cnt DESC, pair ASC LIMIT 1` — pure-ASCII binary compare,
  * identical in Spark and DuckDB — and [[oracleSql]] replays the whole
  * loop as `rounds` unrolled CTE stages over the same parquet, so the
  * learned table is bit-identical by construction. */
object BpeTrain {

  /** Harness defaults — the d53 query and its generated oracle MUST
    * agree on these, so both read them from here. Real tokenizers run
    * 30–50k rounds; 10 keeps the unrolled oracle SQL readable while
    * exercising every moving part (the later rounds already merge
    * 3-symbol outputs of earlier rounds). */
  val DefaultRounds = 10
  val DefaultVocabCap = 65536

  /** One learned merge: rank (1-based), the delimited pair key
    * (`<x><y>`), its merged symbol (`<xy>`), and the weighted count
    * that won the round. */
  final case class Merge(rank: Int, pair: String, merged: String, cnt: Long) {
    /** Plain (x, y) component symbols. */
    def xy: (String, String) = {
      val parts = pair.stripPrefix("<").stripSuffix(">").split("><")
      (parts(0), parts(1))
    }
  }

  /** The weighted vocab: distinct `[a-z0-9]+` words of the lowercased
    * corpus as delimited char states, with frequencies, capped to the
    * top `vocabCap` by (freq DESC, word ASC). */
  def vocab(docs: DataFrame, textCol: String, vocabCap: Int): DataFrame =
    docs.select(explode(expr(
        s"filter(split(lower($textCol), '[^a-z0-9]+'), t -> length(t) > 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(vocabCap)
      .select(regexp_replace(col("w"), "(.)", "<$1>").as("state"), col("freq"))

  /** Run `rounds` of iterated pair counting over the capped vocab;
    * returns the learned merges in rank order. Throws if the vocab
    * runs dry before `rounds` merges exist (a corpus with fewer than
    * `rounds` distinct adjacent pairs — pick a smaller `rounds`). */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int,
      vocabCap: Int): Seq[Merge] = {
    var v = vocab(docs, textCol, vocabCap).localCheckpoint(false)
    val learned = scala.collection.mutable.ArrayBuffer[Merge]()
    for (r <- 1 to rounds) {
      val syms = regexp_extract_all(col("state"), lit("<[^>]+>"), lit(0))
      val pairs = array_distinct(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => concat(a, b)))
      val best = v
        .select(col("state"), col("freq"), explode(pairs).as("pair"))
        .select(col("pair"), expr(
          "freq * ((length(state) - length(replace(state, pair))) div length(pair))").as("cnt"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      require(best.nonEmpty,
        s"BPE training ran dry at round $r/$rounds: no adjacent pairs left")
      val pair = best(0).getString(0)
      val merged = pair.replace("><", "")
      learned += Merge(r, pair, merged, best(0).getLong(1))
      // the merge spec is [a-z0-9<>] only — safe to inline in SQL text
      v = v.withColumn("state", expr(s"replace(state, '$pair', '$merged')"))
        .localCheckpoint(false)
    }
    learned.toSeq
  }

  /** The learned table as a `bpe_count_learned` spec string. */
  def mergeSpec(merges: Seq[Merge]): String =
    merges.map { m => val (x, y) = m.xy; s"$x $y" }.mkString(",")

  /** DuckDB replay of the ENTIRE training loop as unrolled CTEs —
    * `rounds` stages of (pair counts → argmax → apply merge) over the
    * same capped vocab, plus the learned table applied back to the
    * full corpus (the train-then-tokenize round trip). Output matches
    * [[graft.queries.Curate.d53_bpe_train]]: one row per learned
    * merge, with the corpus token total under the final table on
    * every row. */
  def oracleSql(rounds: Int, vocabCap: Int): String = {
    val v0 =
      s"""v0 AS MATERIALIZED (
         |  SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS state, freq FROM (
         |    SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
         |      SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
         |                    t -> length(t) > 0)) AS w
         |      FROM documents)
         |    GROUP BY w ORDER BY freq DESC, w ASC LIMIT $vocabCap))""".stripMargin
    val stages = (1 to rounds).map { k =>
      val prev = s"v${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT pair, CAST(sum(freq * ((length(state) - length(replace(state, pair, ''))) // length(pair))) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT state, freq,
         |      unnest(list_distinct(list_transform(range(1, len(l)), i -> l[i] || l[i + 1]))) AS pair
         |    FROM (SELECT state, freq, regexp_extract_all(state, '<[^>]+>') AS l FROM $prev) t)
         |  GROUP BY pair),
         |b$k AS MATERIALIZED (
         |  SELECT $k AS rank, pair, replace(pair, '><', '') AS merged, cnt
         |  FROM p$k ORDER BY cnt DESC, pair ASC LIMIT 1),
         |v$k AS MATERIALIZED (
         |  SELECT replace(state, (SELECT pair FROM b$k), (SELECT merged FROM b$k)) AS state, freq
         |  FROM $prev)""".stripMargin
    }
    val mergesUnion = (1 to rounds).map(k => s"SELECT * FROM b$k").mkString("\nUNION ALL ")
    // full-corpus tokenization under the learned table: the d50/d52
    // state chain, but each replace pattern is a scalar subquery on
    // the round winners instead of a literal
    val baseState = "regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', '|', 'g')," +
      " '([a-z0-9])', '<\\1>', 'g')"
    val chained = (1 to rounds).foldLeft(baseState) { (acc, k) =>
      s"replace($acc, (SELECT pair FROM b$k), (SELECT merged FROM b$k))"
    }
    s"""WITH $v0,
       |${stages.mkString(",\n")},
       |merges AS MATERIALIZED (
       |$mergesUnion),
       |tot AS MATERIALIZED (
       |  SELECT CAST(sum(length(st) - length(replace(st, '<', ''))) AS BIGINT) AS corpus_tokens
       |  FROM (SELECT $chained AS st FROM documents))
       |SELECT m.rank, m.pair, m.merged, m.cnt, t.corpus_tokens
       |FROM merges m CROSS JOIN tot t""".stripMargin
  }
}
