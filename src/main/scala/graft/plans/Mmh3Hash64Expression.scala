package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for reference-compatible murmur3-64
 * (`graft.functions.Mmh3`). `doGenCode` emits a direct static call, so
 * the hash participates in whole-stage codegen like a builtin — no UDF
 * serialization boundary, no Row boxing. This is the §7.5 "custom
 * Expression only where built-ins can't express the semantics" case:
 * Spark has xxhash64/murmur3_32 but nothing bit-compatible with
 * Python mmh3.hash64.
 */
case class Mmh3Hash64(child: Expression, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mmh3_hash64 requires STRING input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "mmh3_hash64"

  override protected def nullSafeEval(input: Any): Any =
    graft.functions.Mmh3.hash64(input.asInstanceOf[UTF8String].getBytes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Mmh3.hash64($c.getBytes(), ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): Mmh3Hash64 =
    copy(child = newChild)
}

object Mmh3Hash64 {
  import org.apache.spark.sql.graft.bridge
  /** Column builder: mmh3_64(col) == python mmh3.hash64(value)[0]. */
  def mmh3_64(c: Column, seed: Long = 0L): Column =
    bridge.toColumn(Mmh3Hash64(bridge.toExpression(c), seed))
}
