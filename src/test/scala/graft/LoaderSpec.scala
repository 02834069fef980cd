package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Mbrainz, SchemaRegistry}
import graft.pipeline.{Batcher, Loader, Retry}
import graft.query.Explore
import graft.store.Store

/** E2 loader + store + E3 queries, end-to-end on the reference data:
  * batch (E1) → load (E2) → explore (E3), plus the idempotency and
  * resume properties (SURVEY §5.5). */
class LoaderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val basedir = "/root/reference/subsets"
  private lazy val registry = SchemaRegistry.load(s"$basedir/entities/schema.edn")

  private val types = Seq("schema", "enums", "super-enums", "artists", "areleases",
    "areleases-artists", "labels", "releases", "releases-artists")

  private lazy val batchesDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("loaderbatches").toString
    val b = new Batcher(spark, basedir, dir, batchSize = 100)
    types.foreach(b.createBatchFile)
    dir
  }

  private lazy val loaded: (Store, Map[String, Long]) = {
    val storeDir = java.nio.file.Files.createTempDirectory("store").toString
    val store = new Store(spark, storeDir)
    val loader = new Loader(spark, registry, store)
    val stats = types.map(t => t -> loader.loadBatchFile(t, s"$batchesDir/$t.edn").txes).toMap
    (store, stats)
  }

  test("full import applies every batch once") {
    val (_, stats) = loaded
    assert(stats("schema") == 1)
    assert(stats("enums") == 1)
    assert(stats("super-enums") == 82)
    assert(stats("artists") == 47)
    assert(stats("areleases") == 102)
    assert(stats("labels") == 13)
    assert(stats("areleases-artists") == 106)
    assert(stats("releases-artists") == 119)
    assert(stats("releases") == 116) // 11510 rows / 100
  }

  test("idempotency: re-running is a no-op") {
    val (store, _) = loaded
    val before = store.eav.count()
    val loader = new Loader(spark, registry, store)
    val again = types.map(t => loader.loadBatchFile(t, s"$batchesDir/$t.edn").txes).sum
    assert(again == 0, "no batch should re-apply")
    assert(store.eav.count() == before)
  }

  test("resume: a partially-applied type only loads the remainder") {
    val storeDir = java.nio.file.Files.createTempDirectory("store2").toString
    val store = new Store(spark, storeDir)
    val loader = new Loader(spark, registry, store)
    // simulate a crashed run: first 10 batches of artists already in
    val firstTen = java.nio.file.Files.createTempFile("partial", ".edn")
    val all = graft.sources.EdnSource.readText(s"$batchesDir/artists.edn").split('\n')
    java.nio.file.Files.write(firstTen, all.take(10).mkString("\n").getBytes)
    assert(loader.loadBatchFile("artists", firstTen.toString).txes == 10)
    val rest = loader.loadBatchFile("artists", s"$batchesDir/artists.edn")
    assert(rest.txes == 37)
  }

  test("explore: unique attrs self-join finds schema uniques") {
    val (store, _) = loaded
    val rows = Explore.uniqueAttrs(store).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("artist/gid") == "db.unique/identity")
    assert(rows("label/gid") == "db.unique/identity")
    assert(rows.size >= 6)
  }

  test("explore: entity counts per unique attr match source data") {
    val (store, _) = loaded
    val counts = Explore.entityCountsByUniqueAttr(store, registry).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("artist/gid") == 4601)
    assert(counts("label/gid") == 1207)
    assert(counts("abstractRelease/gid") == 10180)
    // releases.edn has 11510 rows but only 11434 distinct gids —
    // :db.unique/identity upserts merge the duplicates, as Datomic would
    assert(counts("release/gid") == 11434)
  }

  test("explore: batch frequencies (first-dash prefix, faithful)") {
    val (store, _) = loaded
    val freq = Explore.batchFrequencies(store).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "areleases" merges areleases(102) + areleases-artists(106);
    // "releases" merges releases(116) + releases-artists(119)
    assert(freq("artists") == 47)
    assert(freq("areleases") == 208)
    assert(freq("releases") == 235)
    assert(freq("super") == 82) // "super-enums-N" → "super"
  }

  test("upsert: releases-artists hoist adds refs to existing releases") {
    val (store, _) = loaded
    import org.apache.spark.sql.functions._
    val cur = store.current(registry)
    val withArtists = cur.filter(col("a") === "release/artists")
      .select(col("e")).distinct().count()
    assert(withArtists > 10000, s"releases with artists: $withArtists")
    // card-many union: no duplicate (e,a,v)
    val dups = cur.filter(col("a") === "release/artists")
      .groupBy("e", "a", "v").count().filter(col("count") > 1).count()
    assert(dups == 0)
  }

  test("retry: transient failures back off then succeed") {
    var calls = 0
    val slept = scala.collection.mutable.ArrayBuffer[Long]()
    val r = Retry.retrying(
      () => { calls += 1; if (calls < 4) throw new java.io.IOException("flaky"); 42 },
      Retry.transientIo, Retry.backoff(100, 30000, 2.0, 12), slept.append(_))
    assert(r == 42 && calls == 4)
    assert(slept.toSeq == Seq(100L, 200L, 400L))
  }

  test("retry: non-transient rethrows immediately") {
    var calls = 0
    intercept[IllegalArgumentException](Retry.retrying(
      () => { calls += 1; throw new IllegalArgumentException("fatal") },
      Retry.transientIo, Retry.backoff(), _ => ()))
    assert(calls == 1)
  }

  test("retry: backoff exhaustion rethrows") {
    intercept[java.io.IOException](Retry.retrying(
      () => throw new java.io.IOException("down"),
      Retry.transientIo, Retry.backoff(1, 4, 2.0, maxTries = 3), _ => ()))
  }
}
