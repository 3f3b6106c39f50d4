package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Word n-gram shingles as a native expression — scalar replacement for
 * the TextOps.wordShingles HOF (`transform(sequence, i ->
 * concat_ws(slice(toks, i, n)))`). The lambda form is interpreted (no
 * whole-stage codegen) and rebuilds each shingle with a fresh
 * slice+join — O(tokens x n) object churn per document, paid by every
 * shingle consumer: the minhash family, contamination reports,
 * fingerprints, the curation pipeline. One pass here: split once, join
 * adjacent windows directly.
 *
 * Identical semantics to the HOF form (law-spec'd): Java-regex `\s+`
 * split with limit -1 (Spark's split), shorter-than-n docs produce ONE
 * shingle = all tokens space-joined (even when that is the empty
 * string), otherwise tokens.length - n + 1 space-joined windows.
 */
case class WordShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1: $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesExpression.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.WordShinglesExpression.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpression =
    copy(child = newChild)
}

object WordShinglesExpression {
  import org.apache.spark.sql.graft.bridge

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Shingle array of `s` (static so codegen can call it directly). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = ws.split(s.toString, -1)
    if (toks.length < n)
      return new GenericArrayData(
        Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def word_shingles(c: Column, n: Int): Column =
    bridge.toColumn(WordShinglesExpression(bridge.toExpression(c), n))
}
