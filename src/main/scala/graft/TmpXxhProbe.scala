package graft
object TmpXxhProbe {
  def main(args: Array[String]): Unit = {
    val P1 = -7046029288634856825L; val P2 = -4417276706812531889L
    val P4 = -8796714831421723037L; val P5 = 2870177450012600261L
    val input = 123456789L; val seed = 42L
    var h = seed + P5 + 8L
    println("PROBE h0 " + h)
    val k = java.lang.Long.rotateLeft(input * P2, 31) * P1
    println("PROBE k " + k)
    h ^= k
    println("PROBE hx " + h)
    h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
    println("PROBE h2 " + h)
    h ^= h >>> 33; h *= P2; println("PROBE f1 " + h)
    h ^= h >>> 29; h *= -4417276706812531889L; println("PROBE fwrong " + 0)
    println("PROBE done")
    // full fmix fresh:
    var g = java.lang.Long.rotateLeft(java.lang.Long.rotateLeft(input * P2, 31) * P1 ^ (seed + P5 + 8L), 0)
    val real = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(input, seed)
    println("PROBE real " + real)
  }
}
