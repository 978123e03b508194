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
}
