package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Curate

/** Curation family: semantics + the plan shapes that make them scale
  * (corpus-wide state broadcasts back, scans stay single-pass). */
class CurateSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("d54: two-phase top-k output is independent of input partitioning") {
    // the phase-1 rank salts on spark_partition_id(), so the proof
    // that ANY partitioning yields the same kept set (the per-domain
    // order is total: quality desc, then rep_doc — a min over
    // disjoint doc sets) must hold observationally too
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      Curate.urlDedup(df, cap = 2).orderBy("domain").collect().map(_.toString).toSeq
    val one = run(docs.repartition(1))
    val many = run(docs.repartition(17, col("doc_id")))
    val skew = run(docs.repartition(5, (col("doc_id") % 2).cast("int")))
    assert(one === many)
    assert(one === skew)
  }

  test("writeShards: deterministic layout — re-run from a re-partitioned input is byte-order identical") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val d1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val d2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Curate.writeShards(docs, d1, nShards = 8)
    // different physical input layout — same logical corpus
    Curate.writeShards(docs.repartition(13), d2, nShards = 8)
    def layout(dir: String): Seq[(Int, Seq[Long])] =
      (0 until 8).map { s =>
        val rows = spark.read.parquet(s"$dir/shard=$s")
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        (s, rows)
      }
    val l1 = layout(d1); val l2 = layout(d2)
    assert(l1 === l2, "shard membership AND intra-shard order must be re-run stable")
    assert(l1.map(_._2.size).sum === docs.count())
    // membership matches the plan query's rule
    val planned = docs
      .select(col("doc_id"), pmod(expr("xxhash64(doc_id)"), lit(8)).cast("int").as("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    l1.foreach { case (s, rows) => rows.foreach(id => assert(planned(id) === s)) }
  }

  test("d39: temperature mixing up-weights low-resource groups") {
    import spark.implicits._
    // two languages, 100:1 token imbalance — with T=2 (sqrt) the
    // small group's keep RATE must exceed the big group's (raw
    // proportional sampling would give both the same rate)
    val docs = ((1 to 200).map(i => (i.toLong, ("w " * 50).trim, "big")) ++
      (201 to 202).map(i => (i.toLong, ("w " * 50).trim, "small")))
      .toDF("doc_id", "text", "lang")
    val rates = Curate.temperatureMix(docs, budgetTokens = 1000L)
      .select("lang", "rate_bp").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // big: t=10000, small: t=100 → w=100000 vs 10000; budgets 909 vs 90
    // → rates 909 bp vs 9000 bp: the small group keeps a 10x rate
    assert(rates("small") > rates("big") * 5,
      s"sqrt temperature must up-weight the small group: $rates")
    assert(rates("small") <= 10000L && rates("big") >= 1L)
  }

  test("d19: scrub replaces every pattern occurrence and counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at a.b@x-corp.io or c@y.org today", "en", "srcT", 0L),
      (2L, "see https://ex.com/a?b=1 and http://t.co x", "en", "srcT", 0L),
      (3L, "customer per customer, accustomed customers", "en", "srcT", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Curate.scrub(df).collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(6)))
    assert(out(0)._1 === 2L) // two emails
    assert(out(0)._4 === "mail me at <EMAIL> or <EMAIL> today")
    assert(out(1)._2 === 2L) // two urls
    assert(out(1)._4 === "see <URL> and <URL> x")
    // word boundary: "accustomed"/"customers" survive, bare "customer" doesn't
    assert(out(2)._3 === 2L)
    assert(out(2)._4 === "<TOK> per <TOK>, accustomed customers")
  }

  test("d19 on testdata: zero PII, full-length passthrough minus token redactions") {
    val out = Curate.d19_pii_scrub(spark, sf)
    val agg = out.agg(sum("n_email"), sum("n_url"), sum("n_tok")).collect()(0)
    assert(agg.getLong(0) === 0L && agg.getLong(1) === 0L)
    assert(agg.getLong(2) > 0L) // the wordlist token occurs in the corpus
  }

  test("d24: injected PII fires the email/URL patterns on every doc") {
    val out = Curate.d24_pii_fixture(spark, sf)
    val n = graft.sources.Tables.documents(spark, sf).count()
    assert(out.count() === n)
    // every doc got exactly one synthetic email and one synthetic URL
    val bad = out.filter(col("n_email") =!= 1L || col("n_url") =!= 1L).count()
    assert(bad === 0L)
    // redaction really shortened the text: <EMAIL>/<URL> replace longer spans
    val unshrunk = Curate.d24_pii_fixture(spark, sf)
      .join(graft.sources.Tables.documents(spark, sf), "doc_id")
      .filter(col("clean_len") >= length(col("text")) + lit(60))
      .count()
    assert(unshrunk === 0L)
  }

  test("d20: boilerplate set joins back as a broadcast, corpus never self-joins") {
    val df = Curate.d20_boilerplate(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(800))
    // ratio bounds: bp in [0, 10000]
    val bad = df.filter(col("boiler_bp") < 0 || col("boiler_bp") > 10000).count()
    assert(bad === 0L)
  }

  test("d21: benchmark-source docs are excluded; contaminated implies n_contam>0") {
    val df = Curate.d21_decontaminate(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => (r.getLong(2) == 1L) == (r.getLong(1) > 0L)))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("d48: bloom decontamination honors no-false-negatives and agrees with exact d21") {
    val r = Curate.d48_bloom_decontaminate(spark, sf).collect().head
    assert(r.getAs[Boolean]("no_false_negatives"),
      "a bloom filter can never miss a truly contaminated gram")
    assert(r.getAs[Boolean]("fp_docs_ok"))
    // the exact contamination count must equal d21's contaminated set
    // restricted to docs that HAVE grams (d48's population)
    val d21Contam = Curate.d21_decontaminate(spark, sf).collect()
      .count(_.getLong(2) == 1L).toLong
    assert(r.getAs[Long]("n_true_contam_docs") == d21Contam,
      s"${r.getAs[Long]("n_true_contam_docs")} vs d21 $d21Contam")
  }

  test("d22: sample is deterministic and respects per-stratum rates") {
    val a = Curate.d22_hash_sample(spark, sf).collect().map(_.getLong(0)).sorted
    val b = Curate.d22_hash_sample(spark, sf).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b)) // hash-derived, not rand(): stable across runs
    val byLang = Curate.d22_hash_sample(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.sources.Tables.documents(spark, sf).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en keeps ~30%, others ~10%; allow generous slack at 500 docs
    val enRate = byLang.getOrElse("en", 0L).toDouble / total("en")
    assert(enRate > 0.15 && enRate < 0.45, s"en rate $enRate")
    // no shuffle: map-only sample
    val p = Curate.d22_hash_sample(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(500))
  }

  test("d36: shard plan is exhaustive, in-range, and deterministic") {
    val rows = Curate.d36_shard_plan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    // every document lands in exactly one shard; ids within [0, 16)
    assert(rows.map(_._2).sum === nDocs)
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16), rows.mkString(","))
    assert(rows.map(_._1).distinct.length === rows.length)
    // hash-derived, not rand(): byte-identical across runs
    val again = Curate.d36_shard_plan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
    // the first_doc really is the shard's hash-min (spot-check the
    // first non-empty shard rather than assuming shard 0 is populated)
    import org.apache.spark.sql.functions._
    val probe = rows.minBy(_._1)
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), expr("xxhash64(doc_id)").as("h"))
      .filter(pmod(col("h"), lit(16)) === probe._1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(docs.nonEmpty, s"plan lists shard ${probe._1} but no docs hash there")
    assert(probe._3 === docs.minBy(_._2)._1)
  }

  test("d22 bucket arithmetic matches the oracle's hex-parse path") {
    import spark.implicits._
    // literal pins: int(md5("<id>:graft").hex[:15], 16) % 100, computed
    // independently — a different hash that's merely stable would fail
    val expected = Map(0L -> 35L, 1L -> 88L, 41L -> 5L, 9999L -> 50L)
    val buckets = expected.keys.toSeq.toDF("doc_id")
      .select(col("doc_id"), Curate.hashBucket(col("doc_id"), "graft", 100).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(buckets === expected)
  }

  test("withPrefixSum matches the window prefix sum; no single-partition exchange") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("k", "v")
      .repartition(8) // scrambled input partitioning
    val got = graft.ops.GlobalIndex.withPrefixSum(df, Seq(col("k")), "v", "cum")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(2)))
    var acc = 0L
    (1L to 1000L).foreach { i =>
      acc += i % 7
      assert(got(i.toInt - 1) === ((i, acc)), s"at k=$i")
    }
  }

  test("d32: multi-chunk docs overlap by size-stride and clip at the boundary") {
    import spark.implicits._
    // 300 tokens → chunks at starts 0/96/192 (ends 128/224/300): the
    // sf corpus is all single-chunk, so the windowing path pins here
    val docs = Seq((1L, (1 to 300).map(i => s"w$i").mkString(" ")),
        (2L, "a b c"), (3L, ""))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("d32").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Curate.d32_chunking(spark, dir).orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0L, 0L, 128L), (1L, 1L, 96L, 224L), (1L, 2L, 192L, 300L),
      (2L, 0L, 0L, 3L), (3L, 0L, 0L, 0L)))
  }

  test("d29: packs partition the corpus in doc order and reconcile token totals") {
    val sf = "/root/testdata/sf0.001"
    val out = Curate.d29_sequence_pack(spark, sf).orderBy("pack_id").collect()
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .select(when(length(trim(col("text"))) === 0, 0L)
        .otherwise(size(split(trim(col("text")), " +")).cast("long")).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(out.map(_.getAs[Long]("pack_tokens")).sum === total,
      "every token lands in exactly one pack")
    // doc ranges are contiguous and non-overlapping across pack ids
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc") ||
          a.getAs[Long]("last_doc") + 1 == b.getAs[Long]("first_doc"))
      case _ => ()
    }
  }

  test("d20: boilerplate-set join strategy is the optimizer's choice (no forced hint)") {
    // the boilerplate gram set is DATA-DEPENDENT — on a 100 TB corpus
    // every common phrase qualifies and a forced broadcast OOMs; the
    // join key is the gram both sides already shuffle on, so AQE picks
    // broadcast only when the aggregated set is actually small
    val analyzed = Curate.d20_boilerplate(spark, sf).queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint") && !analyzed.contains("UnresolvedHint"),
      s"d20 must not force a join strategy:\n${analyzed.take(400)}")
  }

  test("d51: DSIR ranks target-vocabulary docs above off-vocabulary ones; target never selected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dsir").toString + "/t"
    // target (src0) speaks 'alpha beta'; raw docs 1/2 are target-like,
    // 3/4 are off-vocabulary noise
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha", "en", "src0"),
      (1L, "alpha beta alpha beta", "en", "src1"),
      (2L, "alpha beta noise", "en", "src1"),
      (3L, "noise gamma delta zz yy xx", "en", "src2"),
      (4L, "unrelated words entirely here", "en", "src2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.queries.Curate.d51_dsir(spark, dir, k = 4).collect()
    assert(out.length == 4 && !out.exists(_.getString(1) == "src0"),
      "the target slice itself is never a selection candidate")
    val scores = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.map(_.getLong(3)).toSeq == out.map(_.getLong(3)).sorted.reverse.toSeq,
      "descending score order")
    assert(scores(1L) > scores(3L) && scores(1L) > scores(4L),
      s"target-like doc must outrank noise: $scores")
    assert(scores(2L) > scores(4L), s"partially target-like beats fully off: $scores")
  }

  test("d52: fertility >= 1 per source (BPE never undercounts words), chars/token sane") {
    val rows = graft.queries.Curate.d52_fertility(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("fertility")) >= 1.0, r.toString)
      val cpt = r.getDouble(r.fieldIndex("chars_per_token"))
      assert(cpt > 1.0 && cpt < 10.0, r.toString)
    }
  }

  test("d33: gopher rules — healthy prose passes, empty/numeric docs fail") {
    import spark.implicits._
    val good = "the quick brown fox and " * 20 // 100 words, 2 stops, mean 3.8
    val docs = Seq(
      (1L, good),
      (2L, ""),        // empty: every metric 0
      (3L, "1 2 3 4")) // numeric-only: zero alphabetic words
      .toDF("doc_id", "text")
    val rows = graft.queries.Curate.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getBoolean(rows(1L).fieldIndex("pass")))
    assert(rows(1L).getLong(rows(1L).fieldIndex("n_words")) == 100)
    assert(rows(1L).getLong(rows(1L).fieldIndex("mean_word_len_x100")) == 380)
    assert(rows(1L).getLong(rows(1L).fieldIndex("stop_hits")) == 2)
    val empty = rows(2L)
    assert(empty.getLong(empty.fieldIndex("n_words")) == 0
      && !empty.getBoolean(empty.fieldIndex("pass")))
    val numeric = rows(3L)
    assert(numeric.getLong(numeric.fieldIndex("alpha_bp")) == 0
      && !numeric.getBoolean(numeric.fieldIndex("pass")))
  }

  test("d54: canonicalization collapses variants; per-domain cap bites and keeps best-quality pages") {
    val rows = Curate.d54_url_dedup(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nUrls, nPages, nKept) = (r.getLong(r.fieldIndex("n_urls")),
        r.getLong(r.fieldIndex("n_pages")), r.getLong(r.fieldIndex("n_kept")))
      assert(nPages <= nUrls, s"${r.getString(0)}: canonical pages cannot exceed crawls")
      assert(nKept == math.min(2L, nPages), s"${r.getString(0)}: cap=2 exact")
      // canonicalization actually fired: domains are all lowercase,
      // no www., no port
      val dom = r.getString(r.fieldIndex("domain"))
      assert(dom == dom.toLowerCase && !dom.startsWith("www.") && !dom.contains(":"))
    }
    // variants of the same page really collapsed somewhere (urls > pages overall)
    assert(rows.map(r => r.getLong(r.fieldIndex("n_urls"))).sum >
      rows.map(r => r.getLong(r.fieldIndex("n_pages"))).sum)
  }

  test("d55: terciles are per-language balanced and tier occupancy conserves the corpus") {
    val rows = Curate.d55_ccnet_buckets(spark, "/root/testdata/sf0.001").collect()
    val byTier = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byTier.keySet == Set("head", "middle", "tail"))
    // ntile(3) balance: per language the tier sizes differ by ≤ 1, so
    // corpus-wide each tier deviates from total/3 by < nLangs (5 here)
    val total = byTier.values.sum
    byTier.values.foreach(n => assert(math.abs(n * 3 - total) <= 3 * 5))
    val nScored = graft.queries.Llm.d30_unigram_logprob(spark, "/root/testdata/sf0.001").count()
    assert(total == nScored, "every scored doc lands in exactly one tier")
  }

  test("d56: char entropy — uniform two-char text is exactly 1 bit, floods are dropped, prose kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab" * 40),              // H = exactly 1.0 bit
      (2L, "a" * 80),               // H = 0 — single-char flood
      (3L, "the quick brown fox jumps over the lazy dog and keeps going"),
      (4L, ""))                     // empty: defined, not dropped
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("d56").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Curate.d56_char_entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(out(1L) === ((80L, 2L, 1.0, false)))
    assert(out(2L) === ((80L, 1L, 0.0, false)))
    assert(out(3L)._3 > 3.0 && out(3L)._4, "normal prose clears the keep threshold")
    assert(out(4L) === ((0L, 0L, 0.0, false)), "empty doc is zero-entropy, not an error")
  }

  test("d58: source overlap counts prefix keys shared across sources, once per pair") {
    import spark.implicits._
    val head = (1 to 8).map(i => s"tok$i").mkString(" ")   // the 8-token prefix key
    val docs = Seq(
      (1L, s"$head unique tail one", "sA"),
      (2L, s"$head other tail two", "sB"),   // same key as 1 — pair (sA, sB)
      (3L, s"$head third tail", "sB"),       // DISTINCT collapses the repeat within sB
      (4L, s"$head fourth", "sC"),           // key in 3 sources → 3 pairs
      (5L, "completely different leading words here that never collide at all", "sA"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("d58").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = Curate.d58_source_overlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("sA", "sB") -> 1L, ("sA", "sC") -> 1L, ("sB", "sC") -> 1L),
      "one shared key, counted once per unordered source pair")
  }
}
