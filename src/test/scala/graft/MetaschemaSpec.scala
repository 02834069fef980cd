package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.SchemaRegistry
import graft.pipeline.{Batcher, Loader}
import graft.query.Metaschema
import graft.store.Store

/** The reference's own metaschema declaration drives denormalized
  * views over the store. */
class MetaschemaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val basedir = "/root/reference/subsets"
  private lazy val registry = SchemaRegistry.load(s"$basedir/entities/schema.edn")
  private lazy val decl = Metaschema.load("/root/reference/metaschema/mbrainz.edn")

  test("metaschema parses tables and joins") {
    assert(decl.tables.contains("artist/gid"))
    assert(decl.joins("release/artists") == "artist")
    assert(decl.joins("artist/country") == "country")
    assert(decl.joins.size == 15)
  }

  test("join resolution denormalizes refs to display values") {
    val batches = java.nio.file.Files.createTempDirectory("msbatches").toString
    val b = new Batcher(spark, basedir, batches, batchSize = 1000)
    Seq("schema", "enums", "super-enums", "artists").foreach(b.createBatchFile)
    val store = new Store(spark, java.nio.file.Files.createTempDirectory("msstore").toString)
    val loader = new Loader(spark, registry, store)
    loader.ensureImportSchema()
    Seq("schema", "enums", "super-enums", "artists").foreach(t =>
      loader.loadBatchFile(t, s"$batches/$t.edn"))

    val resolved = Metaschema.resolveJoin(store, registry, decl, "artist/country", "country/name")
    val adamo = resolved.filter(col("e") === lit("artist/gid|d3132eab-36d1-476e-a736-cb6dbb08a4a2"))
      .collect()
    assert(adamo.map(_.getString(1)).toSeq == Seq("Italy"))
    assert(resolved.count() > 1000)
  }
}
