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

object TopK {
  /** Aggregate column: top-k (score, id) pairs per group, best first. */
  def collect_top_k(scoreId: Column, k: Int): Column =
    Bridge.column(CollectTopK(Bridge.expression(scoreId), k)
      .toAggregateExpression())
}
