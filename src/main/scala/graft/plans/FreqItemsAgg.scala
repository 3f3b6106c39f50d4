package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries summary: at most `capacity` counters. */
final class MGSummary(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)
}

/**
 * Heavy hitters over an unbounded key space in bounded memory: a
 * Misra-Gries frequency summary as a native `TypedImperativeAggregate`.
 *
 * The exact `groupBy(key).count` plan shuffles one partial counter per
 * distinct key per partition — fine for bounded vocabularies, but an
 * open key domain (URLs, n-grams, user ids) at 100 TB makes the partial
 * maps themselves the memory problem. This summary caps state at
 * `capacity` counters per partial: an unseen key beyond capacity
 * decrements every counter instead of inserting (Misra-Gries 1982), and
 * partials merge by count-sum followed by subtracting the
 * (capacity+1)-th largest count — the mergeable-summaries reduction
 * (Agarwal et al., PODS 2012), which preserves the deterministic error
 * bound: every reported count is an UNDER-estimate of the true count by
 * at most n/capacity, and any key with true count > n/capacity is
 * guaranteed present.
 *
 * When the distinct-key count never exceeds `capacity`, no decrement
 * ever fires and every count is exact regardless of partitioning or
 * merge order — the regime the SQL-oracle gate pins. The approximation
 * regime's bounds are spec-tested separately.
 */
case class FreqItemsAgg(child: Expression, capacity: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] {
  require(capacity >= 1, s"capacity must be >= 1: $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("count", LongType))))
  override def prettyName: String = "freq_items_mg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_items_mg requires STRING, got ${other.sql}")
  }

  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)

  private def offer(b: MGSummary, key: String, inc: Long): Unit = {
    val cur = b.counts.get(key)
    if (cur != 0L || b.counts.containsKey(key)) b.counts.put(key, cur + inc)
    else if (b.counts.size < capacity) b.counts.put(key, inc)
    else decrementAll(b, inc)
  }

  /** The MG step: an overflow key's weight cancels against every live
    * counter (and itself) instead of inserting. */
  private def decrementAll(b: MGSummary, dec: Long): Unit = {
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - dec
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(b: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) offer(b, v.asInstanceOf[UTF8String].toString, 1L)
    b
  }

  override def merge(b: MGSummary, o: MGSummary): MGSummary = {
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b.counts.get(e.getKey)
      b.counts.put(e.getKey, cur + e.getValue)
    }
    if (b.counts.size > capacity) {
      // subtract the (capacity+1)-th largest count from everything and
      // drop non-positives: at most `capacity` survivors, error bound
      // composes additively across merges
      val vals = new Array[Long](b.counts.size)
      val vit = b.counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1)
      decrementAll(b, cut)
    }
    b
  }

  override def eval(b: MGSummary): Any = {
    val entries = new Array[(String, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // deterministic output order: count desc, then item asc
    val sorted = entries.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c) }.toArray[Any])
  }

  override def serialize(b: MGSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = in.readInt(); val kb = new Array[Byte](len)
      in.readFully(kb)
      b.counts.put(new String(kb, StandardCharsets.UTF_8), in.readLong())
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = newChildren.head)
}

object FreqItemsAgg {
  import org.apache.spark.sql.{DataFrame, functions => F}
  import org.apache.spark.sql.graft.bridge

  /** `(item, count)` structs, count desc — bounded-memory frequency
    * summary; exact when distinct keys <= capacity. */
  def freq_items_mg(c: Column, capacity: Int): Column =
    bridge.toColumn(FreqItemsAgg(bridge.toExpression(c), capacity)
      .toAggregateExpression())

  /** Whole-corpus heavy hitters: one bounded-memory aggregate over the
    * key column, exploded to `(item, cnt)` rows. The shuffle carries one
    * <= capacity-entry summary per partition, independent of the key
    * domain's size. */
  def heavyHitters(df: DataFrame, keyCol: String, capacity: Int): DataFrame =
    df.agg(freq_items_mg(F.col(keyCol), capacity).as("__hh__"))
      .select(F.explode(F.col("__hh__")).as("__e__"))
      .select(F.col("__e__.item").as("item"), F.col("__e__.count").as("cnt"))
}
