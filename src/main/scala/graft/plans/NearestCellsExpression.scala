package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/**
 * The `n` nearest coarse-quantizer cells (by squared L2) for an
 * embedding — the IVF probe/assignment kernel, nearest first, ties by
 * cell index ascending. Native replacement for the interpreted Scala
 * UDF this used to be: the UDF path deserializes every vector to a
 * boxed `Seq[Double]` through the Catalyst converter on the CORPUS scan
 * (the big side), outside whole-stage codegen. This expression reads
 * the unsafe array data in place, does one pass of primitive
 * arithmetic per (vector, center) pair, and participates in codegen
 * via an object-reference call — the same shape as
 * [[Simhash16Expression]].
 *
 * The centers matrix rides the expression itself (a plan constant,
 * shipped once per task like a broadcast); a coarse quantizer is small
 * by construction (k-means cells, k in the tens-to-thousands), never
 * data-sized.
 */
case class NearestCellsExpression(child: Expression,
                                  centers: Array[Array[Double]],
                                  n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }

  private lazy val elemIsFloat: Boolean =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }

  /** Distances + bounded selection; `n` is a probe count (small). */
  def compute(arr: ArrayData): ArrayData = {
    val k = centers.length
    val dists = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centers(i)
      var d = 0.0
      var j = 0
      while (j < c.length) {
        val v = if (elemIsFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        val t = c(j) - v
        d += t * t
        j += 1
      }
      dists(i) = d
      i += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < m) {
      var best = -1
      var bd = Double.PositiveInfinity
      var t = 0
      while (t < k) {
        if (!used(t) && (best < 0 || dists(t) < bd)) { bd = dists(t); best = t }
        t += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this,
      classOf[NearestCellsExpression].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpression =
    copy(child = newChild)
}

object NearestCellsExpression {
  import org.apache.spark.sql.graft.bridge

  /** Column builder: array of the `n` nearest center indices, nearest
    * first, ties by index ascending. */
  def nearest_cells(vec: Column, centers: Array[Array[Double]], n: Int): Column =
    bridge.toColumn(NearestCellsExpression(bridge.toExpression(vec), centers, n))
}
