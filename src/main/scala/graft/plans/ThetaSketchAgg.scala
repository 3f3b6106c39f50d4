package graft.plans

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Theta sketches (Apache DataSketches) as native aggregates + scalar set
 * operations — the mergeable DISTINCT algebra that HLL cannot provide.
 * An HLL sketch unions; a Theta sketch also INTERSECTS and SUBTRACTS, so
 * "distinct users who did A and B" / "did A but not B" over 100 TB of
 * events becomes arithmetic over kilobyte summaries instead of a
 * count(DISTINCT) self-join. The pattern: materialize one sketch per
 * fine grain (source × day), roll up with [[ThetaUnionAgg]], and answer
 * any overlap question with [[ThetaSketchOps]] scalars — no rescan.
 *
 * Exactness contract (what the oracle gate pins): a QuickSelect update
 * sketch keeps theta = 1 and every retained hash while the distinct
 * count stays at or below `nomEntries`, and union/intersection/a-not-b
 * of exact sketches are exact, so estimates in that regime are exact
 * integers. Beyond it the relative standard error is
 * ~1/sqrt(nomEntries) (~1.6% at the default 4096). Beyond-parity: the
 * reference's only distinct counter is the exact `uniq_count`
 * (funclib.py:60-66).
 */
final class ThetaUnionBuffer(val nomEntries: Int) {
  val union: Union =
    SetOperation.builder().setNominalEntries(nomEntries).buildUnion()
}

private[plans] trait ThetaAggBase extends TypedImperativeAggregate[ThetaUnionBuffer] {
  def nomEntries: Int
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): ThetaUnionBuffer = {
    require(nomEntries >= 16 && Integer.bitCount(nomEntries) == 1,
      s"nomEntries must be a power of 2 >= 16: $nomEntries")
    new ThetaUnionBuffer(nomEntries)
  }
  override def merge(b: ThetaUnionBuffer, o: ThetaUnionBuffer): ThetaUnionBuffer = {
    b.union.union(o.union.getResult)
    b
  }
  override def eval(b: ThetaUnionBuffer): Any = b.union.getResult.toByteArray
  override def serialize(b: ThetaUnionBuffer): Array[Byte] =
    b.union.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): ThetaUnionBuffer = {
    val b = createAggregationBuffer()
    b.union.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    b
  }
}

/** Aggregate: build a Theta sketch over a value column (long/int/string/
  * double accepted; nulls skipped). */
case class ThetaSketchAgg(child: Expression, nomEntries: Int = 4096,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires an integral/string/double column, got ${other.sql}")
  }

  override def update(b: ThetaUnionBuffer, input: InternalRow): ThetaUnionBuffer = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => b.union.update(v.asInstanceOf[Long])
      case IntegerType => b.union.update(v.asInstanceOf[Int].toLong)
      case ShortType => b.union.update(v.asInstanceOf[Short].toLong)
      case ByteType => b.union.update(v.asInstanceOf[Byte].toLong)
      case StringType => b.union.update(v.asInstanceOf[UTF8String].toString)
      case DoubleType => b.union.update(v.asInstanceOf[Double])
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = newChildren.head)
}

/** Aggregate: union serialized sketch partials produced by
  * [[ThetaSketchAgg]] — the rollup side of the pre-aggregated sketch
  * table pattern. */
case class ThetaUnionAgg(child: Expression, nomEntries: Int = 4096,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "theta_union_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_union_agg requires a BINARY sketch column, got ${other.sql}")
  }

  override def update(b: ThetaUnionBuffer, input: InternalRow): ThetaUnionBuffer = {
    val v = child.eval(input)
    if (v != null)
      b.union.union(Sketches.wrapCompactSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = newChildren.head)
}

object ThetaSketchOps {
  private[plans] def wrap(bytes: Array[Byte]): CompactSketch =
    Sketches.wrapCompactSketch(Memory.wrap(bytes))

  /** Scalar ops over serialized sketches. These run POST-aggregation on
    * sketch tables (rows = groups, not events), so `CodegenFallback` is
    * deliberate: the hot per-row path is the codegen'd aggregate above;
    * these touch kilobytes per output row. */
  sealed abstract class ThetaBinaryOp extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (BINARY, BINARY) sketches, got $other")
      }
    protected def combine(a: Sketch, b: Sketch): CompactSketch
    override protected def nullSafeEval(a: Any, b: Any): Any =
      combine(wrap(a.asInstanceOf[Array[Byte]]),
        wrap(b.asInstanceOf[Array[Byte]])).toByteArray
  }

  case class ThetaIntersect(left: Expression, right: Expression) extends ThetaBinaryOp {
    override def prettyName: String = "theta_intersect"
    override protected def combine(a: Sketch, b: Sketch): CompactSketch =
      SetOperation.builder().buildIntersection().intersect(a, b)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class ThetaANotB(left: Expression, right: Expression) extends ThetaBinaryOp {
    override def prettyName: String = "theta_a_not_b"
    override protected def combine(a: Sketch, b: Sketch): CompactSketch =
      SetOperation.builder().buildANotB().aNotB(a, b)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class ThetaUnionPair(left: Expression, right: Expression, nomEntries: Int)
      extends ThetaBinaryOp {
    override def prettyName: String = "theta_union_pair"
    override protected def combine(a: Sketch, b: Sketch): CompactSketch = {
      val u = SetOperation.builder().setNominalEntries(nomEntries).buildUnion()
      u.union(a); u.union(b); u.getResult
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** Distinct-count estimate, rounded to the nearest long (exact-regime
    * estimates are integral already). */
  case class ThetaEstimate(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "theta_estimate"
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_estimate requires a BINARY sketch, got ${other.sql}")
    }
    override protected def nullSafeEval(v: Any): Any =
      Math.round(wrap(v.asInstanceOf[Array[Byte]]).getEstimate)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }
}
