package graft.plans

/** Shared md5-hex plumbing for the native text expressions: a reused
  * per-thread digest (MessageDigest is not thread-safe) and the
  * lowercase hex encoding that matches Spark's `md5`. */
private[plans] object Md5Kernel {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  def digest(): java.security.MessageDigest = { val d = md5.get(); d.reset(); d }

  def hex32(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HEX((d(j) >> 4) & 0xf)
      out(2 * j + 1) = HEX(d(j) & 0xf)
      j += 1
    }
    new String(out)
  }
}
