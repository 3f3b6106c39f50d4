package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mutable reservoir buffer: `seen` counts the stream, `items` holds at
  * most k survivors. */
final class Reservoir(val k: Int, var seen: Long,
                      val items: scala.collection.mutable.ArrayBuffer[UTF8String]) {
  def rng(salt: Long): java.util.Random = new java.util.Random(seen * 0x9e3779b97f4a7c15L ^ salt)
}

/**
 * One-pass exact-k reservoir sample over a string column — a native
 * `TypedImperativeAggregate`, the §7.5 "custom aggregate only where
 * builtins can't express it" case. `orderBy(rand).limit(k)` ships k rows
 * per partition to a driver-side merge (TakeOrderedAndProject); this
 * aggregate keeps the merge distributed (partial reservoirs combine on
 * executors) and never materializes a random sort key column. Decisions
 * derive from (seen-count, seed), so a given partitioning yields a
 * deterministic sample.
 */
case class ReservoirSampleAgg(child: Expression, k: Int, seed: Long,
                              mutableAggBufferOffset: Int = 0,
                              inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Reservoir] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "reservoir_sample"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"reservoir_sample requires STRING input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Reservoir =
    new Reservoir(k, 0L, scala.collection.mutable.ArrayBuffer.empty)

  override def update(b: Reservoir, input: org.apache.spark.sql.catalyst.InternalRow): Reservoir = {
    val v = child.eval(input)
    if (v != null) {
      b.seen += 1
      val s = v.asInstanceOf[UTF8String].clone()
      if (b.items.length < k) b.items += s
      else {
        val j = (b.rng(seed).nextDouble() * b.seen).toLong
        if (j < k) b.items(j.toInt) = s
      }
    }
    b
  }

  override def merge(b: Reservoir, o: Reservoir): Reservoir = {
    if (o.seen == 0) return b
    if (b.seen == 0) { b.seen = o.seen; b.items.clear(); b.items ++= o.items; return b }
    val total = b.seen + o.seen
    if (b.items.length + o.items.length <= k) {
      // both reservoirs are complete samples of their streams
      b.items ++= o.items
      b.seen = total
      return b
    }
    // weighted draw without replacement: each reservoir item represents
    // seen/|items| stream elements; draw k picking a side proportional
    // to its remaining represented weight. This keeps per-element
    // selection probability ~k/total even when one side is under-full
    // (the naive fill-then-swap favored the small side enormously).
    val r = b.rng(seed ^ o.seen)
    val sr = scala.util.Random.javaRandomToRandom(r)
    val bItems = sr.shuffle(b.items.toSeq)
    val oItems = sr.shuffle(o.items.toSeq)
    val wPerB = b.seen.toDouble / bItems.length
    val wPerO = o.seen.toDouble / oItems.length
    var wb = b.seen.toDouble
    var wo = o.seen.toDouble
    var bi = 0
    var oi = 0
    val picked = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    while (picked.length < k && (bi < bItems.length || oi < oItems.length)) {
      val takeB = bi < bItems.length &&
        (oi >= oItems.length || r.nextDouble() < wb / (wb + wo))
      if (takeB) { picked += bItems(bi); bi += 1; wb -= wPerB }
      else { picked += oItems(oi); oi += 1; wo -= wPerO }
    }
    b.items.clear()
    b.items ++= picked
    b.seen = total
    b
  }

  override def eval(b: Reservoir): Any =
    new GenericArrayData(b.items.toArray[Any])

  override def serialize(b: Reservoir): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k); out.writeLong(b.seen); out.writeInt(b.items.length)
    b.items.foreach { s =>
      val bytes = s.getBytes
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Reservoir = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt(); val seen = in.readLong(); val n = in.readInt()
    val items = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    (0 until n).foreach { _ =>
      val len = in.readInt(); val buf = new Array[Byte](len)
      in.readFully(buf); items += UTF8String.fromBytes(buf)
    }
    new Reservoir(kk, seen, items)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ReservoirSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ReservoirSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ReservoirSampleAgg =
    copy(child = newChildren.head)
}

object ReservoirSampleAgg {
  import org.apache.spark.sql.graft.bridge

  /** Column builder: array<string> of up to k sampled values. */
  def reservoir_sample(c: Column, k: Int, seed: Long = 0L): Column =
    bridge.toColumn(
      ReservoirSampleAgg(bridge.toExpression(c), k, seed).toAggregateExpression())
}
