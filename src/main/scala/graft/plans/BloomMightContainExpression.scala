package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/**
 * Set-membership probe against a broadcast Bloom filter — the scale path
 * for "does this value occur in a reference set" pre-filters (n-gram
 * decontamination, blocklist scrubbing). The filter travels as a
 * `Broadcast` handle: tasks serialize the few-byte broadcast id, and the
 * bitset ships to each executor ONCE via the torrent protocol rather
 * than once per task inside the serialized plan — a ~1 MB filter over a
 * million reference grams costs 1000 executors 1 GB total, not
 * 100k tasks x 1 MB.
 *
 * Probing uses the filter's binary path on the value's UTF-8 bytes,
 * symmetric with the build side (`BloomDecontaminate` puts UTF-8 bytes).
 * Codegen resolves the broadcast once per operator instance into a
 * mutable field, so the per-row work is exactly one might-contain probe
 * inside whole-stage codegen — no UDF boundary, no boxing.
 *
 * Bloom semantics make this a PRE-filter only: false positives pass (a
 * downstream exact join must confirm), false negatives cannot occur.
 */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires STRING, got ${child.dataType.sql}")
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bf: BloomFilter = bloom.value

  override protected def nullSafeEval(input: Any): Any =
    bf.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[_]].getName)
    val bfField = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$bfField.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  import org.apache.spark.sql.graft.bridge

  def might_contain(c: Column, bloom: Broadcast[BloomFilter]): Column =
    bridge.toColumn(BloomMightContain(bridge.toExpression(c), bloom))
}
