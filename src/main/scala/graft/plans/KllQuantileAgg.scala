package graft.plans

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * Mergeable quantiles: the KLL sketch (Karnin-Lang-Liberty, FOCS 2016;
 * Apache DataSketches implementation) as native aggregates. Spark's
 * built-in `percentile_approx` answers one query over one scan;
 * materializing a KLL SKETCH COLUMN at a fine grain instead makes every
 * later percentile question — any quantile, any rollup level — a
 * kilobyte-sized merge ([[KllMergeAgg]]) plus a scalar probe
 * ([[KllQuantileExpr]]), never a rescan of the raw 100 TB. The sketch is
 * mergeable with a deterministic rank-error bound (~1.65/sqrt(k) at one
 * standard deviation), independent of data order and partitioning.
 *
 * Exactness contract (what the oracle gate pins): a KLL sketch retains
 * every value until its level-0 buffer of `k` items first compacts, so
 * while the TOTAL count folded into a sketch (including merges) stays
 * <= k, `getQuantile(q, INCLUSIVE)` is exactly the sorted item at
 * 1-based index ceil(q*n) — reproducible in ANSI SQL as
 * `list_sort(list(v))[ceil(q*count(*))]`. Beyond-parity: the
 * reference's `quantile` (funclib.py:137-178) sorts the whole group in
 * memory.
 */
private[plans] trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] {
  def k: Int
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): KllDoublesSketch = {
    require(k >= 8 && k <= 65535, s"k must be in [8, 65535]: $k")
    KllDoublesSketch.newHeapInstance(k)
  }
  override def merge(b: KllDoublesSketch, o: KllDoublesSketch): KllDoublesSketch = {
    b.merge(o); b
  }
  override def eval(b: KllDoublesSketch): Any = b.toByteArray
  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

/** Aggregate: build a KLL doubles sketch over a numeric column (cast to
  * double; nulls skipped). */
case class KllSketchAgg(child: Expression, k: Int = 200,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a numeric column, got ${other.sql}")
  }

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = child.dataType match {
        case DoubleType => v.asInstanceOf[Double]
        case FloatType => v.asInstanceOf[Float].toDouble
        case LongType => v.asInstanceOf[Long].toDouble
        case IntegerType => v.asInstanceOf[Int].toDouble
        case ShortType => v.asInstanceOf[Short].toDouble
        case ByteType => v.asInstanceOf[Byte].toDouble
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      b.update(d)
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Aggregate: merge serialized KLL partials produced by [[KllSketchAgg]]. */
case class KllMergeAgg(child: Expression, k: Int = 200,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends KllAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge_agg requires a BINARY sketch column, got ${other.sql}")
  }

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** Scalar: quantile probe on a serialized sketch (INCLUSIVE search —
  * smallest retained item whose inclusive rank >= q). NULL for an empty
  * sketch. Post-aggregation scalar, hence `CodegenFallback`. */
case class KllQuantileExpr(child: Expression, q: Double)
    extends UnaryExpression with CodegenFallback {
  require(q >= 0.0 && q <= 1.0, s"quantile must be in [0, 1]: $q")
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantile requires a BINARY sketch, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Scalar: number of values folded into a sketch. */
case class KllCountExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "kll_n"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_n requires a BINARY sketch, got ${other.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
