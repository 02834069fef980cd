package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.edn.Edn
import graft.edn.Edn._
import graft.pipeline.Batcher
import graft.sources.EdnSource

/** Golden end-to-end tests (SURVEY.md §5): run pipeline E1 on the
  * reference's entity files and compare output to the committed golden
  * batch files with parse-based (whitespace/key-order-insensitive) EDN
  * equality. Two golden sets: `subsets/batches` (size 100) and
  * `subsets/old-batches` (size 5000, includes `releases` which the
  * size-100 set is missing). */
class BatcherGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private val basedir = "/root/reference/subsets"
  private lazy val out100 = {
    val dir = java.nio.file.Files.createTempDirectory("batches100").toString
    new Batcher(spark, basedir, dir, batchSize = 100)
  }
  private lazy val out5000 = {
    val dir = java.nio.file.Files.createTempDirectory("batches5000").toString
    new Batcher(spark, basedir, dir, batchSize = 5000)
  }

  /** Normalizations, each a documented reference artifact:
    *  - `enums`: the golden's in-batch order for `medium_format` is
    *    Clojure *hash-map* iteration order (maps with > 8 entries lose
    *    insertion order when read); order inside one transaction batch
    *    is semantically irrelevant, so compare batch data as multisets.
    *  - `releases` (old-batches only): that golden predates the
    *    `release_group → :release/abstractRelease` mapping present in
    *    the current reference (`importer.clj:104`); strip the attr from
    *    our output before comparing. Everything else is exact,
    *    order-sensitive. */
  private def compareGolden(b: Batcher, outDir: String, goldenDir: String, tpe: String): Unit = {
    b.createBatchFile(tpe)
    val mine = Edn.parseAll(EdnSource.readText(s"$outDir/$tpe.edn"))
    val golden = Edn.parseAll(EdnSource.readText(s"$goldenDir/$tpe.edn"))
    assert(mine.size == golden.size, s"$tpe: batch count ${mine.size} != golden ${golden.size}")
    mine.zip(golden).zipWithIndex.foreach { case ((m0, g), i) =>
      val m = if (tpe == "releases" && goldenDir.endsWith("old-batches"))
        stripAttr(m0, EKw("release", "abstractRelease")) else m0
      if (tpe == "enums") {
        val md = data(m).groupBy(identity).view.mapValues(_.size).toMap
        val gd = data(g).groupBy(identity).view.mapValues(_.size).toMap
        assert(ident(m) == ident(g), s"$tpe: batch $i ident differs")
        assert(md == gd, s"$tpe: batch $i data multiset differs")
      } else assert(m == g, s"$tpe: batch $i differs")
    }
  }

  private def data(batch: Edn): Vector[Edn] =
    batch.asInstanceOf[EMap].getKw("data").get.asInstanceOf[EVec].items
  private def ident(batch: Edn): Edn =
    batch.asInstanceOf[EMap].getKw("batch-ident").get
  private def stripAttr(batch: Edn, k: EKw): Edn = {
    val b = batch.asInstanceOf[EMap]
    EMap(b.entries.map {
      case (dk @ EKw("", "data"), EVec(items)) =>
        (dk: Edn) -> (EVec(items.map {
          case m: EMap => EMap(m.entries.filterNot(_._1 == k))
          case other => other
        }): Edn)
      case other => other
    })
  }

  private val size100Types =
    Seq("schema", "enums", "super-enums", "artists", "areleases",
      "labels", "areleases-artists", "releases-artists")

  size100Types.foreach { tpe =>
    test(s"golden size-100: $tpe") {
      compareGolden(out100, out100.outDir, s"$basedir/batches", tpe)
    }
  }

  (size100Types :+ "releases").foreach { tpe =>
    test(s"golden size-5000: $tpe") {
      compareGolden(out5000, out5000.outDir, s"$basedir/old-batches", tpe)
    }
  }
}
