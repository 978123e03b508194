package graft.functions

/** Mod-p universal-hash family for the VERIFIABLE MinHash operator
  * (`docs_minhash_sig`): sig_i = min over shingles of
  * (a_i·h + b_i) mod p with p = 2⁶¹−1 (Mersenne prime) and h the
  * first 60 bits of md5(shingle).
  *
  * Why a second family next to [[MinHashSigAgg]]'s 64-bit wrapping
  * multiply: wrap-around arithmetic is NOT expressible in ANSI SQL,
  * so those signatures can only be oracled indirectly (the lsh
  * operator verifies against exact Jaccard). This family keeps every
  * intermediate below 2¹²² — exact in Spark DECIMAL(38,0) and in an
  * external engine's 128-bit integers — so a DuckDB oracle replays
  * the signatures bit-for-bit. The constants are fixed forever
  * (splitmix64 stream), like the wrapping family's, so stored
  * signatures stay comparable across runs and engines.
  */
object MinHashSig {
  /** 2⁶¹ − 1, the largest Mersenne prime whose products with 60-bit
    * hashes stay inside 38 decimal digits (DECIMAL(38,0) / int128).
    */
  val P: Long = (1L << 61) - 1

  val PERMS = 16

  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** (a_i, b_i) with 1 ≤ a < p, 0 ≤ b < p. */
  def coeff(i: Int): (Long, Long) = {
    val a = ((splitmix(i.toLong * 2 + 1) >>> 3) % (P - 1)) + 1
    val b = (splitmix(i.toLong * 2 + 2) >>> 3) % P
    (a, b)
  }

  /** a·h mod p in pure 64-bit arithmetic (a, h < p): the 128-bit
    * product splits into (hi, lo) via `Math.multiplyHigh`, and
    * 2⁶⁴ ≡ 8 (mod 2⁶¹−1) folds it back — the classic Mersenne
    * reduction. Exactly equals the BigInt/HUGEINT computation (the
    * DuckDB oracle and the property test), ~20× cheaper than
    * DECIMAL(38,0) expression math.
    */
  def mulMod(a: Long, h: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // both < 2⁶¹ ⇒ signed == unsigned
    val lo = a * h
    var r = (lo & P) + (lo >>> 61) + hi * 8 // < 2⁶² — no overflow
    r = (r & P) + (r >>> 61)
    if (r >= P) r - P else r
  }

  /** (a·h + b) mod p. */
  def affineMod(a: Long, b: Long, h: Long): Long = {
    val s = mulMod(a, h) + b // < 2p
    if (s >= P) s - P else s
  }
}

/** Mod-p MinHash signature aggregator — the [[MinHashSigAgg]] shape
  * (one buffer, tight long[] loop, map-side combinable) over the
  * verifiable [[MinHashSig]] family: sig_i = min (a_i·h + b_i) mod p.
  */
class ModPSigAgg extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Long], Array[Long]] {
  import MinHashSig._
  private val as = Array.tabulate(PERMS)(i => coeff(i)._1)
  private val bs = Array.tabulate(PERMS)(i => coeff(i)._2)

  override def zero: Array[Long] = Array.fill(PERMS)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < PERMS) {
      val v = affineMod(as(i), bs(i), h)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < PERMS) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] = MinHashSigAgg.enc
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] = MinHashSigAgg.enc
}
