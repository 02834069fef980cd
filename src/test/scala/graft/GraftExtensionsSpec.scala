package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with spark.sql.extensions=graft.GraftExtensions
  * resolves the native functions in pure SQL, no imperative
  * registration — and they agree with the HashExprs.register path.
  *
  * The shared TestSpark context stays up: `spark.sql.extensions` is a
  * STATIC conf (only honored when the SparkContext is born), so over
  * the existing context the spec goes through the equivalent public
  * `Builder.withExtensions` hook; a cold-started session would use
  * the config string. Default/active sessions are cleared so
  * getOrCreate builds a new session, and restored after. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions install the codegen functions for pure SQL") {
    TestSpark.spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[8]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
      import spark.implicits._
      Seq(("d1", "some shared text about spark engines"))
        .toDF("id", "text").createOrReplaceTempView("docs")
      val viaSql = spark.sql(
        """SELECT minhash_sig(text) AS sig, simhash64(text) AS sh,
          |  lsh_bands(text, 8) AS bands,
          |  lsh_bands_from_sig(minhash_sig(text), 8) AS bands2,
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot
          |FROM docs""".stripMargin).collect()(0)
      assert(viaSql.getSeq[Long](0).length == 32)
      assert(viaSql.getSeq[Long](2) == viaSql.getSeq[Long](3),
        "bands from text and from sig must agree")
      assert(viaSql.getDouble(4) == 11.0)
      graft.functions.HashExprs.register(spark)
      val viaReg = spark.sql("SELECT simhash64(text) FROM docs").collect()(0).getLong(0)
      assert(viaReg == viaSql.getLong(1), "extension and register paths agree")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
