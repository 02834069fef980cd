package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.SchemaRegistry
import graft.pipeline.{Batcher, Loader}
import graft.store.Store

/** Wide entity tables pivoted from the EAV store (the metaschema's
  * relational view) + offline compaction. */
class EntityTableSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val basedir = "/root/reference/subsets"
  private lazy val registry = SchemaRegistry.load(s"$basedir/entities/schema.edn")

  private lazy val store: Store = {
    val batches = java.nio.file.Files.createTempDirectory("etbatches").toString
    val b = new Batcher(spark, basedir, batches, batchSize = 1000)
    Seq("schema", "enums", "super-enums", "artists").foreach(b.createBatchFile)
    val st = new Store(spark, java.nio.file.Files.createTempDirectory("etstore").toString)
    val loader = new Loader(spark, registry, st)
    loader.ensureImportSchema()
    Seq("schema", "enums", "super-enums", "artists").foreach(t =>
      loader.loadBatchFile(t, s"$batches/$t.edn"))
    st
  }

  test("artist entity table has one row per artist with typed columns") {
    val artists = store.entityTable(registry, "artist")
    assert(artists.count() == 4601)
    val adamo = artists.filter(col("name") === "Adamo").collect()(0)
    assert(adamo.getAs[String]("type") == "ident|artist.type/person")
    assert(adamo.getAs[String]("gender") == "ident|artist.gender/male")
    assert(adamo.getAs[String]("country") == "ident|country/IT")
    assert(adamo.getAs[String]("startYear") == "1943")
    assert(adamo.getAs[String]("startMonth") == null) // reference drops it (typo'd name-map)
  }

  test("spark.sql over registered store views") {
    store.registerViews(registry)
    val n = spark.sql("SELECT count(*) FROM artist").collect()(0).getLong(0)
    assert(n == 4601)
    val top = spark.sql(
      """SELECT c.v AS country, count(*) AS n
        |FROM eav_current c WHERE c.a = 'artist/country'
        |GROUP BY 1 ORDER BY n DESC, country LIMIT 1""".stripMargin).collect()(0)
    assert(top.getString(0).startsWith("ident|country/"))
    val joined = spark.sql(
      """SELECT a.name FROM artist a
        |WHERE a.country = 'ident|country/IT' ORDER BY a.name LIMIT 3""".stripMargin)
      .collect().map(_.getString(0))
    assert(joined.length == 3)
  }

  test("fulltext search honors :db/fulltext schema metadata") {
    val hits = graft.query.Explore.fulltext(store, registry, "Adamo").collect()
    assert(hits.nonEmpty)
    assert(hits.forall(r => registry(r.getString(1)).fulltext), "only fulltext attrs")
    assert(hits.exists(r => r.getString(1) == "artist/name"))
    // tokenized match — substring of a token must NOT hit
    assert(graft.query.Explore.fulltext(store, registry, "dam").collect().isEmpty)
  }

  test("progress heartbeat reports while a job runs") {
    val ticks = new java.util.concurrent.atomic.AtomicInteger(0)
    val p = new graft.ops.Progress(spark, "test", intervalMs = 0, _ => { ticks.incrementAndGet(); () })
    try {
      store.eav.groupBy("a").count().collect()
      // listener events are async; wait briefly for delivery
      val deadline = System.currentTimeMillis() + 5000
      while (ticks.get() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(ticks.get() > 0)
    } finally p.close()
  }

  test("compaction collapses history but preserves current state") {
    // separate store so the shared fixture stays intact
    val st = new Store(spark, java.nio.file.Files.createTempDirectory("cstore").toString)
    val loader = new Loader(spark, registry, st)
    def line(batch: String, name: String) =
      s"""{:batch-ident {:db/id "datomic.tx", :mbrainz.initial-import/batch-id "$batch"}, :data [""" +
        s"""{:artist/gid #uuid "55555555-5555-4555-8555-555555555555", :artist/name "$name", :artist/sortName "S"}]}"""
    def load(batch: String, name: String): Unit = {
      val f = java.nio.file.Files.createTempFile("c", ".edn")
      java.nio.file.Files.write(f, line(batch, name).getBytes)
      loader.loadBatchFile("artists", f.toString); ()
    }
    load("artists-1", "Old"); load("artists-2", "New")
    val before = st.eav.filter(col("a") === "artist/name").count()
    assert(before == 2)
    st.compact(registry)
    assert(st.eav.filter(col("a") === "artist/name").count() == 1)
    val cur = st.current(registry).filter(col("a") === "artist/name").collect()
    assert(cur.map(_.getAs[String]("v")).toSeq == Seq("New"))
  }
}
