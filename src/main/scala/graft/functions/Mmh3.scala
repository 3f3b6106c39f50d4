package graft.functions

/**
 * MurmurHash3 x64_128 (public-domain algorithm, Austin Appleby) — the
 * hash behind the reference's `compute_hash`/`generate_key_hash`
 * (reference: utils.py:374-375 `abs(mmh3.hash64(v)[0])`,
 * dataframe.py:4056-4089). Bit-identical to Python's `mmh3.hash64`, so
 * key hashes, hash-batched splits and hash-gated samples carry over
 * unchanged when migrating stored outputs from the reference.
 *
 * Spark's builtin hash exprs (xxhash64, murmur3_32) are different
 * functions — this exists precisely for cross-system fidelity.
 */
object Mmh3 {

  private final val C1 = 0x87c37b91114253d5L
  private final val C2 = 0x4cf5ad432745937fL

  private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** First 64-bit word of murmur3 x64_128, signed (== mmh3.hash64(v)[0]). */
  def hash64(data: Array[Byte], seed: Long): Long = {
    val length = data.length
    var h1 = seed
    var h2 = seed
    val nblocks = length / 16
    var i = 0
    while (i < nblocks) {
      val base = i * 16
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tailStart = nblocks * 16
    val tl = length - tailStart
    var k1 = 0L
    var k2 = 0L
    if (tl >= 9) {
      var j = tl - 1
      while (j >= 8) {
        k2 ^= (data(tailStart + j) & 0xffL) << ((j - 8) * 8); j -= 1
      }
      k2 *= C2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= C1; h2 ^= k2
    }
    if (tl > 0) {
      var j = math.min(tl, 8) - 1
      while (j >= 0) {
        k1 ^= (data(tailStart + j) & 0xffL) << (j * 8); j -= 1
      }
      k1 *= C1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= C2; h1 ^= k1
    }
    h1 ^= length; h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2 // h2 += h1 not needed for the first word
    h1
  }

  def hash64(s: String, seed: Long): Long =
    hash64(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  private def getLongLE(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) |
      ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) |
      ((b(off + 3) & 0xffL) << 24) |
      ((b(off + 4) & 0xffL) << 32) |
      ((b(off + 5) & 0xffL) << 40) |
      ((b(off + 6) & 0xffL) << 48) |
      ((b(off + 7) & 0xffL) << 56)
}
