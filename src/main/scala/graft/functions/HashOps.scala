package graft.functions

/**
 * Deterministic hash primitives used by the dedup/fingerprint
 * expressions. Static (JVM-wide, allocation-free where possible) so
 * generated code can call them directly from whole-stage codegen.
 */
object HashOps {

  /** FNV-1a 64-bit over UTF-8 bytes — stable document fingerprint. */
  def fnv64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit mix (splitmix64 finalizer) — cheap per-token hash. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** SimHash-64 over an array of token strings: per-token 64-bit hash,
   * each bit votes +1/-1, sign of the vote is the output bit. */
  def simhash64(tokens: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /**
   * Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03
   * "Winnowing: Local Algorithms for Document Fingerprinting"): hash
   * every k-gram of the string, then keep the minimum hash of each
   * sliding window of w k-grams. Returns the distinct sorted sample —
   * a compact, position-robust signature for near-dup detection.
   */
  def winnow(s: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return Array(fnv64(s))
    // rolling k-gram hashes (polynomial base-257 with wraparound)
    val grams = new Array[Long](n)
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * 257L + (bytes(i) & 0xffL); if (i < k - 1) pow *= 257L; i += 1 }
    grams(0) = mix64(h)
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * 257L + (bytes(i + k - 1) & 0xffL)
      grams(i) = mix64(h)
      i += 1
    }
    if (n <= w) return Array(grams.min)
    val picked = scala.collection.mutable.TreeSet.empty[Long]
    i = 0
    while (i + w <= n) {
      var m = grams(i)
      var j = i + 1
      while (j < i + w) { if (grams(j) < m) m = grams(j); j += 1 }
      picked += m
      i += 1
    }
    picked.toArray
  }
}
