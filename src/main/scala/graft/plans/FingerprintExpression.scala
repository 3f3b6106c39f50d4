package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowing-style document fingerprint: lexicographic minimum of md5-hex
 * over word n-gram shingles — the native form of
 * `array_min(transform(wordShingles(text, n), md5))`, whose lambda
 * evaluates interpreted and allocates the full shingle + digest arrays.
 * One pass here: shingle strings stream through a reused digest and only
 * the running minimum survives. Hex is lowercase like Spark's `md5`, and
 * the minimum is byte-lexicographic — identical to `array_min` over
 * UTF8 hex strings (law-spec'd in Round4Spec).
 */
case class FingerprintExpression(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1: $n")

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fingerprint requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = "doc_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    FingerprintExpression.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.FingerprintExpression.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): FingerprintExpression =
    copy(child = newChild)
}

object FingerprintExpression {
  import org.apache.spark.sql.graft.bridge

  def compute(s: UTF8String, n: Int): UTF8String = {
    val shingles = WordShinglesExpression.compute(s, n)
    var best: String = null
    var i = 0
    while (i < shingles.numElements()) {
      val h = Md5Kernel.hex32(
        Md5Kernel.digest().digest(shingles.getUTF8String(i).getBytes))
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    if (best == null) null else UTF8String.fromString(best)
  }

  def doc_fingerprint(c: Column, n: Int): Column =
    bridge.toColumn(FingerprintExpression(bridge.toExpression(c), n))
}
