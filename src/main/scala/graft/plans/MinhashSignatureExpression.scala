package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * MinHash signature as a native expression: `numHashes` independent hex
 * minima, hash_i(shingle) = md5(i + ":" + shingle) — exactly
 * `Dedup.minhashSignature`'s HOF formulation (array of
 * `array_min(transform(shingles, md5(concat(...))))`), which digested
 * every shingle once per lane through interpreted lambdas. One pass
 * here: shingles stream through a reused digest, each lane keeps a
 * running minimum. (The LSH *dedup* path, `Dedup.lshBands`, stays on
 * its explode + double-hashed-lane shape — signatures as a COLUMN are
 * the per-document API; this keeps that API corpus-scale too.)
 * Law-spec'd equal to the HOF form in Round4Spec.
 */
case class MinhashSignatureExpression(child: Expression, shingleSize: Int,
                                      numHashes: Int)
    extends UnaryExpression {
  require(shingleSize >= 1, s"shingle size must be >= 1: $shingleSize")
  require(numHashes >= 1, s"numHashes must be >= 1: $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignatureExpression.compute(
      input.asInstanceOf[UTF8String], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.MinhashSignatureExpression.compute($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatureExpression =
    copy(child = newChild)
}

object MinhashSignatureExpression {
  import org.apache.spark.sql.graft.bridge

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def hex32(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HEX((d(j) >> 4) & 0xf)
      out(2 * j + 1) = HEX(d(j) & 0xf)
      j += 1
    }
    new String(out)
  }

  def compute(s: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val shingles = WordShinglesExpression.compute(s, shingleSize)
    val digest = md5.get()
    val mins = new Array[String](numHashes)
    var i = 0
    while (i < shingles.numElements()) {
      val sh = shingles.getUTF8String(i).toString
      var lane = 0
      while (lane < numHashes) {
        digest.reset()
        val h = hex32(digest.digest(
          (lane + ":" + sh).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        if (mins(lane) == null || h.compareTo(mins(lane)) < 0) mins(lane) = h
        lane += 1
      }
      i += 1
    }
    new GenericArrayData(
      mins.map(m => UTF8String.fromString(m).asInstanceOf[Any]))
  }

  def minhash_signature(c: Column, shingleSize: Int, numHashes: Int): Column =
    bridge.toColumn(
      MinhashSignatureExpression(bridge.toExpression(c), shingleSize, numHashes))
}
