package graft.ops

/** Stable 64-bit hashing shared by dedup/fingerprint operators. Implemented
  * here (FNV-1a + SplitMix64 finalizer) so hashes are identical across JVMs,
  * Spark versions and parallelism — never rely on String.hashCode or
  * partition order. */
object Hashing extends Serializable {

  def fnv1a64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001B3L
      i += 1
    }
    h
  }

  /** SplitMix64 finalizer — decorrelates seeded variants of one hash. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def seeded(s: String, seed: Long): Long = mix(fnv1a64(s) ^ mix(seed))

  /** Polynomial rolling fingerprint (base 31, mod 2^61-1) over a token
    * stream — the document-fingerprinting primitive. */
  def rollingFingerprint(tokens: Iterator[String]): Long = {
    val M = (1L << 61) - 1
    var h = 0L
    tokens.foreach { t =>
      var i = 0
      while (i < t.length) {
        h = mulMod(h, 31L, M) + t.charAt(i)
        if (h >= M) h -= M
        i += 1
      }
      h = mulMod(h, 31L, M) + ' '
      if (h >= M) h -= M
    }
    h
  }

  private def mulMod(a: Long, b: Long, m: Long): Long = {
    // 128-bit multiply via Math.multiplyHigh (JDK9+), then mod 2^61-1
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold: (hi*2^64 + lo) mod (2^61-1); 2^64 mod (2^61-1) = 8
    val folded = ((hi % m) * 8) % m + java.lang.Long.remainderUnsigned(lo, m)
    folded % m
  }
}
