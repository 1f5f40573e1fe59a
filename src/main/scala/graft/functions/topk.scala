package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // min-heap ordered so the dequeued max is the WORST retained element
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))
  val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
    worstFirst)

  private def betterThanWorst(score: Double, id: Long): Boolean = {
    val (ws, wi) = heap.head
    score > ws || (score == ws && id < wi)
  }

  def add(score: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((score, id))
    else if (betterThanWorst(score, id)) { heap.dequeue(); heap.enqueue((score, id)) }

  def sortedDesc: Seq[(Double, Long)] =
    heap.toSeq.sortBy(t => (-t._1, t._2))
}

/** `collect_top_k(struct(score, id), k)`: per-group top-k by score as a
  * TypedImperativeAggregate — partial bounded heaps combine map-side, so a
  * brute-force ANN scan shuffles only `partitions × k` candidates per query
  * instead of funneling every scored row of a query through one task (the
  * window-function formulation's failure mode at 100 TB). Ties break on the
  * lower id, deterministically. Result: `array<struct<score, id>>`, best
  * first.
  */
case class CollectTopK(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"collect_top_k needs struct<double, bigint>, got ${t.sql}")
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.add(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.heap.foreach { case (s, i) => a.add(s, i) }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val items = buf.sortedDesc
    val bb = ByteBuffer.allocate(4 + items.size * 16)
    bb.putInt(items.size)
    items.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    (0 until n).foreach(_ => buf.add(bb.getDouble, bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CollectTopK =
    copy(child = c)
}

/** Bounded top-k COUNT buffer: keeps the k best (cnt desc, item asc)
  * pairs, items compared as UTF-8 BYTES (Spark's own string ordering and
  * DuckDB's default collation — so an external SQL engine replays the
  * tie-break bit-for-bit). */
final class TopKCountBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  private implicit val utf8Ord: Ordering[UTF8String] =
    Ordering.comparatorToOrdering(
      java.util.Comparator.naturalOrder[UTF8String]())
  // min-heap ordered so the dequeued max is the WORST retained element:
  // lowest cnt, then byte-wise-largest item
  private val worstFirst: Ordering[(Long, UTF8String)] =
    Ordering.by(t => (-t._1, t._2))
  val heap =
    scala.collection.mutable.PriorityQueue.empty[(Long, UTF8String)](
      worstFirst)

  private def betterThanWorst(cnt: Long, item: UTF8String): Boolean = {
    val (wc, wi) = heap.head
    cnt > wc || (cnt == wc && item.compareTo(wi) < 0)
  }

  def add(cnt: Long, item: UTF8String): Unit =
    if (heap.size < k) heap.enqueue((cnt, item))
    else if (betterThanWorst(cnt, item)) {
      heap.dequeue(); heap.enqueue((cnt, item))
    }

  def sortedDesc: Seq[(Long, UTF8String)] =
    heap.toSeq.sortBy(t => (-t._1, t._2))
}

/** `collect_top_counts(struct(cnt, item), k)`: per-group top-k STRING
  * items by count — the bounded-heap sibling of [[CollectTopK]] for the
  * heavy-hitter register build ([[graft.relational.Sketches.hhSketch]]),
  * where the ranked thing is a key, not a numeric id. Partial heaps
  * combine map-side, so truncating a billion-distinct-item count relation
  * to k rows per group shuffles `partitions × k` candidates — never a
  * per-group window over every distinct item (the single-task failure
  * mode at 100 TB). Ties break on the byte-wise smaller item,
  * deterministically. Result: `array<struct<cnt, item>>`, best first. */
case class CollectTopCounts(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKCountBuffer]
    with UnaryLike[Expression] {
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("cnt", LongType),
      StructField("item", StringType))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == LongType && b.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"collect_top_counts needs struct<bigint, string>, got ${t.sql}")
  }

  override def createAggregationBuffer(): TopKCountBuffer =
    new TopKCountBuffer(k)

  override def update(buf: TopKCountBuffer, input: InternalRow)
      : TopKCountBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        // clone: the UTF8String points into a row buffer Spark reuses
        buf.add(row.getLong(0), row.getUTF8String(1).clone())
    }
    buf
  }

  override def merge(a: TopKCountBuffer, b: TopKCountBuffer)
      : TopKCountBuffer = {
    b.heap.foreach { case (c, i) => a.add(c, i) }
    a
  }

  override def eval(buf: TopKCountBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (c, i) =>
      InternalRow(c, i)
    }.toArray[Any])

  override def serialize(buf: TopKCountBuffer): Array[Byte] = {
    val items = buf.sortedDesc
    val bytes = items.map(_._2.getBytes)
    val bb = ByteBuffer.allocate(
      4 + items.size * 12 + bytes.map(_.length).sum)
    bb.putInt(items.size)
    items.zip(bytes).foreach { case ((c, _), b) =>
      bb.putLong(c); bb.putInt(b.length); bb.put(b)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKCountBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKCountBuffer(k)
    (0 until n).foreach { _ =>
      val c = bb.getLong
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(c, UTF8String.fromBytes(b))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectTopCounts =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectTopCounts =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression)
      : CollectTopCounts = copy(child = c)
}

object TopK {
  /** Aggregate column: top-k (score, id) pairs per group, best first. */
  def collect_top_k(scoreId: Column, k: Int): Column =
    Bridge.column(CollectTopK(Bridge.expression(scoreId), k)
      .toAggregateExpression())

  /** Aggregate column: top-k (cnt, item) pairs per group, best first —
    * (cnt desc, item asc by UTF-8 bytes), matching SQL ORDER BY. */
  def collect_top_counts(cntItem: Column, k: Int): Column =
    Bridge.column(CollectTopCounts(Bridge.expression(cntItem), k)
      .toAggregateExpression())
}
