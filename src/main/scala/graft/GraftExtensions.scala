package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** The idiomatic install path for the engine's native expressions:
  * `spark.sql.extensions=graft.GraftExtensions` registers every
  * codegen function (minhash_sig, simhash64, rolling_hash64,
  * ngram_set, minhash_agree, lsh_bands, lsh_bands_from_sig, vec_dot)
  * at session build — no imperative `HashExprs.register` call needed,
  * and the functions resolve in pure SQL (`spark.sql("SELECT
  * simhash64(text) …")`) on every session created with the config,
  * including executors' SQL contexts on a cluster.
  * `HashExprs.register` stays as the programmatic equivalent. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def inject(ext: SparkSessionExtensions, name: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name), builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    inject(ext, "minhash_sig", es => MinHashSignature(es.head))
    inject(ext, "simhash64", es => SimHash64(es.head))
    inject(ext, "rolling_hash64", es => RollingHash64(es.head))
    inject(ext, "ngram_set", es => NGramSet(es.head))
    inject(ext, "minhash_agree", es => MinhashAgree(es.head, es(1)))
    inject(ext, "vec_dot", es => VecDot(es.head, es(1)))
    inject(ext, "lsh_bands", {
      case Seq(text) => LshBands(text, 8)
      case Seq(text, b) => LshBands(text, b.eval(null).asInstanceOf[Number].intValue)
    })
    inject(ext, "lsh_bands_from_sig", {
      case Seq(sig) => LshBandsFromSig(sig, 8)
      case Seq(sig, b) => LshBandsFromSig(sig, b.eval(null).asInstanceOf[Number].intValue)
    })
    inject(ext, "frame_energies", {
      case Seq(text) => FrameEnergies(text, 64)
      case Seq(text, w) => FrameEnergies(text, w.eval(null).asInstanceOf[Number].intValue)
    })
    inject(ext, "ahash_bits", es => AHashBits(es.head, es(1), es(2)))
    inject(ext, "bloom_agg", {
      case Seq(child) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child)
      case Seq(child, items) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items)
      case Seq(child, items, bits) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items, bits)
    })
    inject(ext, "bloom_might_contain", {
      case Seq(bf, v) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(bf, v)
    })
    inject(ext, "char_stats", es => CharStatsExpr(es.head))
    inject(ext, "word_ngrams", {
      case Seq(text) => WordNgramsExpr(text, 3)
      case Seq(text, n) => WordNgramsExpr(text, n.eval(null).asInstanceOf[Number].intValue)
    })
    inject(ext, "ac_counts", {
      case Seq(text) => AcCounts(text, AhoCorasick.BlocklistSpec)
      case Seq(text, spec) => AcCounts(text,
        spec.eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    })
  }
}
