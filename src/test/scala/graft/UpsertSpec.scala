package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.SchemaRegistry
import graft.pipeline.Loader
import graft.store.Store

/** Upsert semantics across sequential loads (SURVEY §7.3 hard part 2):
  * card-one attrs are last-writer-wins by tx, card-many attrs union —
  * driven by schema.edn metadata, per Datomic's :db.unique/identity
  * behavior. */
class UpsertSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val registry =
    SchemaRegistry.load("/root/reference/subsets/entities/schema.edn")

  private def batchFile(lines: String*): String = {
    val f = java.nio.file.Files.createTempFile("upsert", ".edn")
    java.nio.file.Files.write(f, lines.mkString("\n").getBytes)
    f.toString
  }

  test("card-one last-wins, card-many unions, across separate loads") {
    val store = new Store(spark, java.nio.file.Files.createTempDirectory("upsert").toString)
    val loader = new Loader(spark, registry, store)
    val gid = "11111111-1111-4111-8111-111111111111"
    val a1 = "22222222-2222-4222-8222-222222222222"
    val a2 = "33333333-3333-4333-8333-333333333333"

    // load 1: release with name v1 and one artist
    loader.loadBatchFile("releases", batchFile(
      s"""{:batch-ident {:db/id "datomic.tx", :mbrainz.initial-import/batch-id "releases-1"}, :data [""" +
        s"""{:release/gid #uuid "$gid", :release/name "Name V1", :release/artists {:artist/gid #uuid "$a1"}}]}"""))
    // load 2 (different batch id ⇒ not filtered): same entity, new name, second artist
    loader.loadBatchFile("releases", batchFile(
      s"""{:batch-ident {:db/id "datomic.tx", :mbrainz.initial-import/batch-id "releases-2"}, :data [""" +
        s"""{:release/gid #uuid "$gid", :release/name "Name V2", :release/artists {:artist/gid #uuid "$a2"}}]}"""))

    val cur = store.current(registry)
    val e = s"release/gid|$gid"
    val name = cur.filter(col("e") === e && col("a") === "release/name")
      .select("v").collect().map(_.getString(0)).toSeq
    assert(name == Seq("Name V2"), "card-one: last writer wins")
    val artists = cur.filter(col("e") === e && col("a") === "release/artists")
      .select("v").collect().map(_.getString(0)).toSet
    assert(artists == Set(s"artist/gid|$a1", s"artist/gid|$a2"), "card-many: union")
    // the raw log retains history (append-only)
    assert(store.eav.filter(col("e") === e && col("a") === "release/name").count() == 2)
  }

  test("as-of sees the superseded value; since sees only the delta") {
    val store = new Store(spark, java.nio.file.Files.createTempDirectory("asof").toString)
    val loader = new Loader(spark, registry, store)
    val gid = "55555555-5555-4555-8555-555555555555"
    loader.loadBatchFile("releases", batchFile(
      s"""{:batch-ident {:db/id "datomic.tx", :mbrainz.initial-import/batch-id "releases-1"}, :data [""" +
        s"""{:release/gid #uuid "$gid", :release/name "Old Name"}]}"""))
    loader.loadBatchFile("releases", batchFile(
      s"""{:batch-ident {:db/id "datomic.tx", :mbrainz.initial-import/batch-id "releases-2"}, :data [""" +
        s"""{:release/gid #uuid "$gid", :release/name "New Name"}]}"""))
    val e = s"release/gid|$gid"
    def nameAt(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.filter(col("e") === e && col("a") === "release/name")
        .select("v").collect().map(_.getString(0)).toSeq
    val txs = store.eav.filter(col("e") === e && col("a") === "release/name")
      .select("tx").collect().map(_.getLong(0)).sorted
    assert(txs.length == 2 && txs(0) < txs(1), s"two loads must get distinct txs: ${txs.toSeq}")
    assert(nameAt(store.current(registry)) == Seq("New Name"))
    assert(nameAt(store.asOf(registry, txs(0))) == Seq("Old Name"),
      "as-of the first tx must see the superseded value")
    assert(nameAt(store.since(txs(0))) == Seq("New Name"),
      "since the first tx must carry only the re-assertion")
    assert(store.history.filter(col("e") === e && col("a") === "release/name").count() == 2)
  }

  test("attribute-partitioned store prunes scans by attr") {
    val store = new Store(spark, java.nio.file.Files.createTempDirectory("prune").toString)
    val loader = new Loader(spark, registry, store)
    loader.loadBatchFile("artists", batchFile(
      """{:batch-ident {:db/id "datomic.tx", :mbrainz.initial-import/batch-id "artists-1"}, :data [""" +
        """{:artist/gid #uuid "44444444-4444-4444-8444-444444444444", :artist/name "X", :artist/sortName "X"}]}"""))
    val q = store.eav.filter(col("a") === "artist/name")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("isnotnull(a"), p.take(800))
    assert(q.count() == 1)
  }
}
