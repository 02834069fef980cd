package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for joins and aggregations (100 TB posture: a hot
  * key — one famous artist, one giant release — turns a shuffle
  * partition into a straggler). AQE's skew-join handles sort-merge
  * cases at runtime; salting is the explicit, planner-independent
  * tool, and the only option for skewed AGGREGATIONS.
  */
object Salt {

  /** Skewed large-table join: the big side gets a random-but-
    * deterministic salt per row (hash of all join-key bytes + a row
    * discriminator), the small-ish side is replicated `buckets` times.
    * Result equals a plain inner join on `keys`. */
  def saltedJoin(big: DataFrame, right: DataFrame, keys: Seq[String], buckets: Int,
      discriminator: Column): DataFrame = {
    val salted = big.withColumn("__salt", pmod(xxhash64(discriminator), lit(buckets)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Skewed aggregation: two-phase — partial aggregate on
    * (keys, salt), then final aggregate on keys. The caller supplies
    * re-aggregable partials (sum/count/min/max). */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int, discriminator: Column,
      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(discriminator), lit(buckets)))
    val p = salted.groupBy((keys :+ "__salt").map(col): _*).agg(partial.head, partial.tail: _*)
    p.groupBy(keys.map(col): _*).agg(fin.head, fin.tail: _*)
  }
}
