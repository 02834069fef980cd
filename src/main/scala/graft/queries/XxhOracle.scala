package graft.queries

import scala.collection.mutable.ArrayBuffer

/** DuckDB-SQL implementation of XXH64 — generated, not hand-written —
  * so the xxhash-derived queries (d02 minhash bands, d03 LSH pairs,
  * d05 simhash, d06 simhash pairs) get FULL value-level oracles
  * instead of rows-only checks.
  *
  * How: the hash state is a HUGEINT in [0, 2^64); every wrapping
  * multiply is split 32-bit arithmetic ((x*C) mod 2^64 from xl*C and
  * xh*C, no 128-bit overflow), rotations are div/mod by powers of
  * two, xor runs on BIGINT halves. Each intermediate becomes ONE
  * subquery level (`SELECT *, expr AS name FROM (...)`): DuckDB's
  * lateral-alias rewrite inlines aliases textually — a 90-deep chain
  * of multiply-referenced aliases explodes exponentially — while
  * chained subqueries bind as column references and compute once per
  * row. Strings are unrolled for ≤15 bytes (shingles are 5 chars,
  * corpus tokens ≤8); hashes are computed per globally-DISTINCT
  * shingle/token and joined back (a duplicate can't move a min or
  * change a vote count, and the distinct set is tiny).
  *
  * Bit-parity with `org.apache.spark.sql.catalyst.expressions.XXH64`
  * (hashUnsafeBytes / hashLong, seed 42) was validated empirically
  * this round over random strings (len 0–15) and longs, and the four
  * oracle queries match the Spark outputs row-for-row at sf0.001/0.01.
  */
object XxhOracle {
  // XXH64 primes as unsigned decimal (HUGEINT literals)
  private val P1 = "11400714785074694791"
  private val P2 = "14029467366897019727"
  private val P3 = "1609587929392839161"
  private val P4 = "9650029242287828579"
  private val P5 = "2870177450012600261"
  private val U64 = "18446744073709551616::HUGEINT"
  private val U32 = "4294967296::HUGEINT"

  private def signed(u: String): String =
    s"(CASE WHEN $u >= 9223372036854775808::HUGEINT THEN ($u - $U64)::BIGINT ELSE $u::BIGINT END)"
  private def unsigned(x: String): String =
    s"(CASE WHEN $x < 0 THEN $x::HUGEINT + $U64 ELSE $x::HUGEINT END)"

  private val pow2List: String =
    (0 until 64).map(b => (BigInt(1) << b).toString).mkString("[", ",", "]") + "::HUGEINT[]"

  /** let-binding via one subquery level per intermediate. */
  private final class Gen(prefix: String) {
    private var n = 0
    private val levels = ArrayBuffer.empty[(String, String)]
    def let(expr: String): String = { n += 1; val name = s"$prefix$n"; levels += name -> expr; name }
    def wrap(base: String): String =
      levels.foldLeft(s"($base)") { case (sql, (name, expr)) =>
        s"(SELECT *, ($expr) AS $name FROM $sql)"
      }
    def mulc(x: String, c: String): String = {
      val xl = let(s"$x % $U32")
      val xh = let(s"$x // $U32")
      let(s"((($xl * $c::HUGEINT) % $U64) + ((($xh * $c::HUGEINT) % $U32) * $U32)) % $U64")
    }
    def rotl(x: String, r: Int): String = {
      val lo = (BigInt(1) << (64 - r)).toString
      val hi = (BigInt(1) << r).toString
      val t = if (x.contains("(")) let(x) else x
      let(s"(($t % $lo::HUGEINT) * $hi::HUGEINT) + ($t // $lo::HUGEINT)")
    }
    def xor64(a: String, b: String): String = {
      val aa = if (a.contains("(")) let(a) else a
      val bb = if (b.contains("(")) let(b) else b
      let(s"xor(($aa % $U32)::BIGINT, ($bb % $U32)::BIGINT)::HUGEINT + " +
        s"xor(($aa // $U32)::BIGINT, ($bb // $U32)::BIGINT)::HUGEINT * $U32")
    }
    def fmix(h: String): String = {
      val f1 = xor64(h, s"$h // 8589934592::HUGEINT") // >> 33
      val f2 = mulc(f1, P2)
      val f3 = xor64(f2, s"$f2 // 536870912::HUGEINT") // >> 29
      val f4 = mulc(f3, P3)
      xor64(f4, s"$f4 // $U32") // >> 32
    }
    def round8(h: String, w: String): String = {
      val m1 = mulc(w, P2)
      val r1 = rotl(m1, 31)
      val k1 = mulc(r1, P1)
      val hx = xor64(h, k1)
      val r2 = rotl(hx, 27)
      val m2 = mulc(r2, P1)
      let(s"($m2 + $P4::HUGEINT) % $U64")
    }
    def hashLong(x: String, seed: String): String = {
      val h0 = let(s"(($seed) + $P5::HUGEINT + 8::HUGEINT) % $U64")
      val xx = let(x)
      fmix(round8(h0, xx))
    }
    /** XXH64 of an ASCII string expr, length ≤ 15 bytes, seed 42.
      * Inputs outside that envelope fail LOUDLY (DuckDB `error(...)`)
      * instead of hashing wrong: a future corpus with a 16+ byte token
      * or non-ASCII text should break the gate with a clear message,
      * not an inscrutable hash mismatch. */
    def hashStr15(s: String): String = {
      val bs = let(s"list_transform(range(1, length($s)+1), i -> ord(substr($s, i, 1))::HUGEINT)")
      val n = let(s"CASE WHEN strlen($s) > 15 OR strlen($s) <> length($s) " +
        s"THEN error('xxh64 oracle supports ASCII <= 15 bytes, got: ' || $s) " +
        s"ELSE strlen($s) END::HUGEINT")
      val h0 = let(s"(42::HUGEINT + $P5::HUGEINT + $n) % $U64")
      val w8 = let(s"CASE WHEN $n >= 8 THEN " +
        (0 until 8).map(i => s"$bs[${i + 1}] * ${BigInt(1) << (8 * i)}::HUGEINT").mkString(" + ") +
        " ELSE 0::HUGEINT END")
      val h8x = round8(h0, w8)
      val h8 = let(s"CASE WHEN $n >= 8 THEN $h8x ELSE $h0 END")
      val p8 = let(s"CASE WHEN $n >= 8 THEN 8::HUGEINT ELSE 0::HUGEINT END")
      val rem = let(s"$n - $p8")
      val w4 = let(s"CASE WHEN $rem >= 4 THEN " +
        (0 until 4).map(i => s"$bs[($p8 + ${i + 1})::BIGINT] * ${BigInt(1) << (8 * i)}::HUGEINT").mkString(" + ") +
        " ELSE 0::HUGEINT END")
      val hx4 = xor64(h8, let(s"($w4 * $P1::HUGEINT) % $U64"))
      val r4 = rotl(hx4, 23)
      val m4 = mulc(r4, P2)
      val h4x = let(s"($m4 + $P3::HUGEINT) % $U64")
      val h4 = let(s"CASE WHEN $rem >= 4 THEN $h4x ELSE $h8 END")
      val p4 = let(s"$p8 + CASE WHEN $rem >= 4 THEN 4::HUGEINT ELSE 0::HUGEINT END")
      var h = h4
      for (t <- 0 until 3) {
        val b = let(s"CASE WHEN $p4 + $t < $n THEN $bs[($p4 + ${t + 1})::BIGINT] ELSE 0::HUGEINT END")
        val hx = xor64(h, let(s"($b * $P5::HUGEINT) % $U64"))
        val r = rotl(hx, 11)
        val m = mulc(r, P1)
        h = let(s"CASE WHEN $p4 + $t < $n THEN $m ELSE $h END")
      }
      fmix(h)
    }
  }

  /** Shared minhash CTE chain: per-doc distinct 5-char shingles →
    * hash per globally-distinct shingle → double-hash step → 32
    * signed lane minimums → signature list (mirrors
    * `graft.functions.MinHash.computeRaw`). */
  private def minhashCte: String = {
    val g1 = new Gen("x")
    val hu = g1.hashStr15("sg")
    val hhBody = g1.wrap("SELECT sg FROM uniq")
    val g2 = new Gen("y")
    val hl = g2.hashLong("hu", "42::HUGEINT")
    val hxBody = g2.wrap("SELECT sg, hu FROM hh")
    s"""sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(range(0, greatest(length(text)-4, 1)), i -> substr(text, i+1, 5))) AS sg
       |  FROM documents),
       |uniq AS (SELECT DISTINCT sg FROM sh),
       |hh AS (SELECT sg, $hu AS hu FROM $hhBody),
       |hx AS (SELECT sg, hu, ($hl - ($hl % 2) + 1) AS h2u FROM $hxBody),
       |shx AS (SELECT s.doc_id, h.hu, h.h2u FROM sh s JOIN hx h ON s.sg = h.sg),
       |lanes AS (
       |  SELECT doc_id, k, min(${signed(s"((hu + k::HUGEINT * h2u) % $U64)")}) AS m
       |  FROM shx CROSS JOIN (SELECT unnest(range(0, 32)) AS k)
       |  GROUP BY doc_id, k),
       |sig AS (SELECT doc_id, list(m ORDER BY k) AS sig FROM lanes GROUP BY doc_id)""".stripMargin
  }

  /** LSH band hashes from the signature: v = hashLong(band, 42) chained
    * through the band's 4 components (mirrors `LshBandsImpl`). */
  private def bandsCte: String = {
    val g = new Gen("z")
    var v = g.hashLong("b::HUGEINT", "42::HUGEINT")
    for (r <- 0 until 4)
      v = g.hashLong(unsigned(s"sig[(b*4 + ${r + 1})::BIGINT]"), v)
    val body = g.wrap("SELECT doc_id, b, sig FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS b)")
    s"bh AS (SELECT doc_id, b, $v AS v FROM $body)"
  }

  def d02Sql: String =
    s"""WITH $minhashCte,
       |$bandsCte
       |SELECT doc_id, b::BIGINT AS band, ${signed("v")} AS band_hash FROM bh""".stripMargin

  /** d36: deterministic shuffle-shard plan. shard = xxh64(doc_id) mod
    * 16 — with a power-of-two shard count, `pmod(signed, 16)` equals
    * `unsigned % 16` (2^64 ≡ 0 mod 16), so the HUGEINT oracle needs no
    * sign gymnastics; first_doc is the arg-min by the SIGNED hash
    * (Spark's xxhash64 is a signed long), pinning the intra-shard
    * hash order the writer would emit. */
  def d36Sql: String = {
    val g = new Gen("w")
    val h = g.hashLong("doc_id::HUGEINT", "42::HUGEINT")
    val body = g.wrap("SELECT doc_id FROM documents")
    s"""WITH hs AS (SELECT doc_id, $h AS hu FROM $body)
       |SELECT (hu % 16)::BIGINT AS shard, count(*) AS n_docs,
       |  min_by(doc_id, ${signed("hu")}) AS first_doc
       |FROM hs GROUP BY 1""".stripMargin
  }

  /** d38: the shard stage of the composed curation pipeline — the same
    * xxh64(doc_id) mod 16 layout as [[d36Sql]], applied to the curated
    * kept-set. `keptCtes` is a complete WITH-clause body whose final
    * CTE is `packed(doc_id, n_tokens, pack_id)`; this wraps it with
    * the generated hash chain and the per-shard aggregate. */
  def d38Sql(keptCtes: String): String = {
    val g = new Gen("w")
    val h = g.hashLong("doc_id::HUGEINT", "42::HUGEINT")
    val body = g.wrap("SELECT doc_id, n_tokens, pack_id FROM packed")
    s"""WITH $keptCtes,
       |hs AS (SELECT doc_id, n_tokens, pack_id, $h AS hu FROM $body)
       |SELECT (hu % 16)::BIGINT AS shard, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
       |  CAST(count(DISTINCT pack_id) AS BIGINT) AS n_packs,
       |  min_by(doc_id, ${signed("hu")}) AS first_doc
       |FROM hs GROUP BY 1""".stripMargin
  }

  def d03Sql: String =
    s"""WITH $minhashCte,
       |$bandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bh a JOIN bh b ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id)
       |SELECT c.a_id, c.b_id,
       |  round(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) / 32.0, 6) AS est_jaccard
       |FROM cand c JOIN sig sa ON sa.doc_id = c.a_id JOIN sig sb ON sb.doc_id = c.b_id""".stripMargin

  /** Simhash CTE: per-token xxhash votes, bit set when strictly
    * positive; tokenless docs get simhash 0 (mirrors `SimHash`). */
  private def simhashCte: String = {
    val g = new Gen("x")
    val hu = g.hashStr15("w")
    val thBody = g.wrap("SELECT w FROM tuniq")
    s"""tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)) AS w
       |  FROM documents),
       |tuniq AS (SELECT DISTINCT w FROM tok),
       |tha AS (SELECT w, $hu AS hu FROM $thBody),
       |th AS (SELECT t.doc_id, h.hu FROM tok t JOIN tha h ON t.w = h.w),
       |votes AS (
       |  SELECT doc_id, b, sum(CASE WHEN (hu // ($pow2List)[b+1]) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS b)
       |  GROUP BY doc_id, b),
       |simu AS (
       |  SELECT doc_id, sum(CASE WHEN v > 0 THEN ($pow2List)[b+1] ELSE 0::HUGEINT END) AS su
       |  FROM votes GROUP BY doc_id),
       |sim AS (
       |  SELECT d.doc_id, coalesce(${signed("s.su")}, 0) AS simhash
       |  FROM documents d LEFT JOIN simu s ON d.doc_id = s.doc_id)""".stripMargin
  }

  def d05Sql: String =
    s"""WITH $simhashCte
       |SELECT doc_id, simhash FROM sim""".stripMargin

  def d06Sql: String =
    s"""WITH $simhashCte,
       |ch AS (
       |  SELECT doc_id, simhash, c AS chunk_idx, xor(simhash >> (c*16)::INT, 0)::BIGINT & 65535 AS chunk
       |  FROM sim CROSS JOIN (SELECT unnest(range(0, 4)) AS c))
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |FROM ch a JOIN ch b ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 16""".stripMargin

  /** d47 weighted sample: the same xxh64(doc_id) chain as d36, mapped
    * to a uniform u ∈ (0, 1] over 2^20 buckets, then the
    * Efraimidis–Spirakis key −ln(u)/w with w = token count. `ln` is
    * the one transcendental — the d41 BM25 oracle already established
    * ln parity between the engines; output keys round to 6 dp. */
  def d47Sql: String = {
    val g = new Gen("w")
    val h = g.hashLong("doc_id::HUGEINT", "42::HUGEINT")
    val body = g.wrap(
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin)
    s"""WITH hs AS (
       |  SELECT doc_id, n_tokens, ${signed(h)} AS hsg FROM $body
       |  WHERE n_tokens > 0),
       |k AS (
       |  SELECT doc_id, n_tokens,
       |    -ln((((hsg % 1048576 + 1048576) % 1048576) + 1) / 1048576.0) / n_tokens AS key
       |  FROM hs)
       |SELECT doc_id, n_tokens, round(key, 6) AS sample_key
       |FROM k ORDER BY key, doc_id LIMIT 100""".stripMargin
  }

  /** d49 leakage-safe split: the d18 component CTE (same text as its
    * oracle) labels near-dup groups, singletons group by their own
    * doc_id, and the split buckets by the generated xxh64 of the
    * GROUP key — pmod on the signed hash, matching Spark's
    * `pmod(xxhash64(group_key), 10)`. */
  def d49Sql: String = {
    val g = new Gen("w")
    val h = g.hashLong("group_key::HUGEINT", "42::HUGEINT")
    val body = g.wrap("SELECT doc_id, group_key FROM gk")
    s"""WITH RECURSIVE t AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> length(w) > 0) AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) = 0 THEN []
       |         WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
       |         ELSE list_distinct(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
       |    END AS grams FROM t),
       |k AS (SELECT doc_id, grams, list_aggregate(grams, 'min') AS block FROM g WHERE len(grams) > 0),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM k a JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id
       |  WHERE round(len(list_intersect(a.grams, b.grams)) / greatest(len(list_distinct(a.grams || b.grams)), 1), 6) >= 0.5),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT src AS id, src AS r FROM edges
       |  UNION
       |  SELECT e.dst, r.r FROM edges e JOIN reach r ON e.src = r.id),
       |comp AS (SELECT id AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id FROM reach GROUP BY id),
       |gk AS (
       |  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS group_key
       |  FROM documents d LEFT JOIN comp c USING (doc_id)),
       |hs AS (SELECT doc_id, group_key, ((${signed(h)} % 10 + 10) % 10) AS b FROM $body)
       |SELECT doc_id, group_key,
       |  CASE WHEN b <= 7 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
       |FROM hs""".stripMargin
  }

  /** d44 hashed-feature linear classifier: per-token weight
    * `pmod(xxh64(w, 42), 2003) - 1001` (signed-BIGINT pmod on both
    * engines), per-doc INTEGER margin sum — exact under any agg
    * order — normalized to a score at the end. Hashes per DISTINCT
    * token, joined back with multiplicity (a duplicate token adds its
    * weight twice, so the join keeps the tok rows, not the distinct
    * set). */
  /** d51 DSIR: hashed-unigram buckets (xxh64 % 1024), integer
    * Laplace-ratio weights, per-doc integer score, top-25. Same
    * distinct-token hashing shape as d44. */
  def d51Sql: String = {
    val g = new Gen("x")
    val hu = g.hashStr15("w")
    val thBody = g.wrap("SELECT w FROM tuniq")
    s"""WITH tok AS (
       |  SELECT doc_id, source, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)) AS w
       |  FROM documents),
       |tuniq AS (SELECT DISTINCT w FROM tok),
       |tb AS (SELECT w, ((${signed(hu)} % 1024 + 1024) % 1024) AS b FROM $thBody),
       |tokb AS (SELECT t.doc_id, t.source, tb.b FROM tok t JOIN tb USING (w)),
       |ct AS (SELECT b, count(*) AS ct FROM tokb WHERE source = 'src0' GROUP BY b),
       |cr AS (SELECT b, count(*) AS cr FROM tokb WHERE source <> 'src0' GROUP BY b),
       |wt AS (
       |  SELECT coalesce(ct.b, cr.b) AS b,
       |    ((coalesce(ct.ct, 0) + 1) * 10000) // (coalesce(cr.cr, 0) + 1) AS wt
       |  FROM ct FULL OUTER JOIN cr ON ct.b = cr.b)
       |SELECT t.doc_id, t.source, CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(w.wt) AS BIGINT) AS score
       |FROM tokb t JOIN wt w USING (b)
       |WHERE t.source <> 'src0'
       |GROUP BY t.doc_id, t.source
       |ORDER BY score DESC, doc_id ASC LIMIT 25""".stripMargin
  }

  def d44Sql: String = {
    val g = new Gen("x")
    val hu = g.hashStr15("w")
    val thBody = g.wrap("SELECT w FROM tuniq")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)) AS w
       |  FROM documents),
       |tuniq AS (SELECT DISTINCT w FROM tok),
       |tw AS (
       |  SELECT w, ((${signed(hu)} % 2003 + 2003) % 2003) - 1001 AS wt
       |  FROM $thBody),
       |pd AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(sum(tw.wt) AS BIGINT) AS margin
       |  FROM tok t JOIN tw USING (w) GROUP BY t.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(pd.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(pd.margin, 0) AS BIGINT) AS margin,
       |  round(coalesce(pd.margin, 0) / (1001.0 * greatest(coalesce(pd.n_tokens, 0), 1)), 6) AS score,
       |  coalesce(pd.margin, 0) > 0 AS keep
       |FROM documents d LEFT JOIN pd USING (doc_id)""".stripMargin
  }

  /** d64: the count-min sketch replayed value-exactly — four
    * generated hashLong chains (one per CMS row, input user_id*4+i),
    * buckets via unsigned % 1024 (≡ Spark's pmod on the signed hash:
    * 1024 divides 2^64), counters as plain grouped sums, estimates as
    * MIN over the four bucket counters for the exact top-10 users. */
  def d64Sql: String = {
    val g = new Gen("w")
    val hs = (0 to 3).map(i => g.hashLong(s"(user_id*4 + $i)::HUGEINT", "42::HUGEINT"))
    val body = g.wrap(
      "SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1")
    val cols = hs.zipWithIndex.map { case (h, i) => s"($h % 1024)::BIGINT AS b$i" }
      .mkString(", ")
    val unpivot = (0 to 3).map(i =>
      s"SELECT user_id, cnt, $i::BIGINT AS i, b$i AS b FROM hh").mkString("\n  UNION ALL ")
    s"""WITH hh AS (SELECT user_id, cnt, $cols FROM $body),
       |kb AS (
       |  $unpivot),
       |counters AS (SELECT i, b, CAST(SUM(cnt) AS BIGINT) AS c FROM kb GROUP BY 1, 2),
       |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hh),
       |top10 AS (SELECT user_id, cnt FROM hh ORDER BY cnt DESC, user_id LIMIT 10),
       |est AS (
       |  SELECT t.user_id, t.cnt, MIN(c.c) AS est
       |  FROM top10 t JOIN kb k USING (user_id)
       |    JOIN counters c ON c.i = k.i AND c.b = k.b
       |  GROUP BY 1, 2)
       |SELECT user_id, cnt AS true_cnt, est,
       |  est >= cnt AS lb_ok,
       |  (est - cnt) * 512 <= (SELECT n FROM tot) AS bound_ok
       |FROM est""".stripMargin
  }

  /** d65: the classifier TRAINING loop replayed bit-exactly — hashed
    * feature ids via unsigned % 1024 (≡ Spark's pmod: 1024 divides
    * 2^64) over the distinct-token set, then
    * [[graft.ops.ClassifierTrain.Rounds]] unrolled batch-perceptron
    * stages (margins → mistakes → normalized integer gradient step;
    * DuckDB `//` and Spark `div` both truncate toward zero) plus the
    * final-eval row. Round count, label rule K, and the lr schedule
    * come from [[graft.ops.ClassifierTrain]] so the two engines
    * cannot drift. */
  def d65Sql: String = {
    import graft.ops.ClassifierTrain.{D, K, Rounds, lr}
    val g = new Gen("c")
    val hu = g.hashStr15("w")
    val tjBody = g.wrap("SELECT w FROM tuniq")
    def marginCte(name: String, wPrev: String): String =
      s"""$name AS MATERIALIZED (
         |  SELECT f.doc_id, f.y, CAST(sum(f.cnt * coalesce(wp.w, 0)) AS BIGINT) AS margin
         |  FROM feats f LEFT JOIN $wPrev wp USING (j) GROUP BY 1, 2)""".stripMargin
    def statCte(name: String, t: Int, nmCte: String, wCte: String): String =
      s"""$name AS (
         |  SELECT CAST($t AS BIGINT) AS round, nm.nm AS n_mistakes,
         |    (n.n_docs - nm.nm) * 10000 // greatest(n.n_docs, 1) AS acc_bp,
         |    ws.w_l1, ws.w_sum
         |  FROM $nmCte nm CROSS JOIN n CROSS JOIN
         |    (SELECT CAST(sum(abs(w)) AS BIGINT) AS w_l1,
         |       CAST(sum(w) AS BIGINT) AS w_sum FROM $wCte) ws)""".stripMargin
    val rounds = (1 to Rounds).map { t =>
      s"""${marginCte(s"m$t", s"w${t - 1}")},
         |nm$t AS MATERIALIZED (
         |  SELECT CAST(sum(CASE WHEN y * margin <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nm
         |  FROM m$t),
         |g$t AS (
         |  SELECT f.j, CAST(sum(f.y * f.cnt) AS BIGINT) AS g
         |  FROM feats f JOIN m$t m USING (doc_id)
         |  WHERE m.y * m.margin <= 0 GROUP BY 1),
         |w$t AS MATERIALIZED (
         |  SELECT wp.j,
         |    wp.w + CASE WHEN nm.nm > 0
         |      THEN (coalesce(g.g, 0) * ${lr(t)}) // nm.nm ELSE 0 END AS w
         |  FROM w${t - 1} wp LEFT JOIN g$t g USING (j) CROSS JOIN nm$t nm),
         |${statCte(s"s$t", t, s"nm$t", s"w$t")}""".stripMargin
    }.mkString(",\n")
    val unioned = ((1 to Rounds).map(t => s"SELECT * FROM s$t") :+ "SELECT * FROM sf")
      .mkString("\nUNION ALL ")
    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)) AS w
       |  FROM documents),
       |lab AS MATERIALIZED (
       |  SELECT d.doc_id,
       |    CASE WHEN $K * coalesce(t.n_the, 0) >= coalesce(t.n_tok, 0)
       |      THEN 1 ELSE -1 END AS y
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |      CAST(sum(CASE WHEN w = 'the' THEN 1 ELSE 0 END) AS BIGINT) AS n_the
       |    FROM tok GROUP BY 1) t USING (doc_id)),
       |tuniq AS (SELECT DISTINCT w FROM tok),
       |tj AS (SELECT w, ($hu % $D)::BIGINT AS j FROM $tjBody),
       |feats AS MATERIALIZED (
       |  SELECT t.doc_id, l.y, tj.j, CAST(count(*) AS BIGINT) AS cnt
       |  FROM tok t JOIN tj USING (w) JOIN lab l USING (doc_id)
       |  GROUP BY 1, 2, 3
       |  UNION ALL
       |  SELECT doc_id, y, $D, 1 FROM lab),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
       |w0 AS (SELECT range::BIGINT AS j, CAST(0 AS BIGINT) AS w FROM range(${D + 1})),
       |$rounds,
       |${marginCte("mf", s"w$Rounds")},
       |nmf AS (
       |  SELECT CAST(sum(CASE WHEN y * margin <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nm
       |  FROM mf),
       |${statCte("sf", Rounds + 1, "nmf", s"w$Rounds")}
       |$unioned""".stripMargin
  }
}
