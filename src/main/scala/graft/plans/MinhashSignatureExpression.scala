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

  def compute(s: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val shingles = WordShinglesExpression.compute(s, shingleSize)
    // "<lane>:" prefixes encoded once per call, shingle bytes once per
    // shingle — the digest streams prefix + shingle, never building the
    // concatenated string (md5(a || b) == md5 of the streamed parts)
    val prefixes = Array.tabulate(numHashes)(l =>
      (l + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val mins = new Array[String](numHashes)
    var i = 0
    while (i < shingles.numElements()) {
      val shBytes = shingles.getUTF8String(i).getBytes
      var lane = 0
      while (lane < numHashes) {
        val digest = Md5Kernel.digest()
        digest.update(prefixes(lane))
        digest.update(shBytes)
        val h = Md5Kernel.hex32(digest.digest())
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
