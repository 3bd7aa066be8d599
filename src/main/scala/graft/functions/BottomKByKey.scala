package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer behind [[BottomKByKey]]: a max-heap of (key, id)
  * pairs capped at k, so the k SMALLEST keys survive any insertion
  * order — ties break by id, which is what makes the result (and the
  * oracle comparison) deterministic. Each partial buffer holds at
  * most k pairs, so map-side combine ships O(groups * k) to the
  * shuffle no matter how many rows a group has. */
final class BottomKBuffer(val k: Int) {
  private val ord = implicitly[Ordering[(Long, Long)]] // natural: max-heap head = largest
  private[functions] val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)

  def add(key: Long, id: Long): Unit = {
    val kv = (key, id)
    if (heap.size < k) heap.enqueue(kv)
    else if (ord.lt(kv, heap.head)) { heap.dequeue(); heap.enqueue(kv) }
  }

  def mergeIn(other: BottomKBuffer): BottomKBuffer = {
    other.heap.foreach { case (key, id) => add(key, id) }
    this
  }

  /** ids ordered by (key, id) ascending — a canonical, deterministic
    * sample ordering. */
  def sortedIds: Array[Long] =
    heap.toArray.sorted(ord).map(_._2)

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + heap.size * 16)
    bb.putInt(heap.size)
    heap.foreach { case (key, id) => bb.putLong(key); bb.putLong(id) }
    bb.array()
  }
}

object BottomKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): BottomKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new BottomKBuffer(k)
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getLong); i += 1 }
    b
  }
}

/** `bottom_k_by_key(key, id, k)` — aggregate the ids of the k rows
  * with the SMALLEST key per group (ties by id), returned as an
  * array<bigint> sorted by (key, id).
  *
  * This is the deterministic per-group sampler: pass a salted-hash
  * key (e.g. `conv(substr(md5(id), 1, 15), 16, 10)`) and the result
  * is an exact-k uniform-without-replacement sample per group that
  * any engine can reproduce. The alternative formulations don't
  * scale: `row_number() OVER (PARTITION BY g ORDER BY key)` shuffles
  * and SORTS every row of every group; `slice(sort_array(
  * collect_list(...)))` materializes whole groups in memory. This
  * aggregate's partial buffers carry at most k pairs each (heap
  * insertion is O(log k)), so the shuffle traffic is O(groups * k)
  * and a billion-row group costs the same buffer as a thousand-row
  * one. NULL keys/ids are skipped (SQL aggregate convention).
  *
  * k must be a positive integer literal — it sizes the buffer, so it
  * has to be known at planning time. */
case class BottomKByKey(
    first: Expression, second: Expression, third: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] with TernaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // AbstractDataType/ExpectsInputTypes are private[sql], so the
    // integral check is spelled out here instead of via inputTypes
    val ok = Seq(first, second).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType ||
      e.dataType == ShortType || e.dataType == ByteType)
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k_by_key expects integral key and id, got " +
          s"(${first.dataType.simpleString}, ${second.dataType.simpleString})")
    else if (!third.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bottom_k_by_key: k must be a literal (it sizes the buffer at planning time)")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(third.dataType))
      // dtype gate first: Number.intValue() would silently TRUNCATE a
      // fractional (2.9 -> 2) or out-of-range (2^32+1 -> 1) k
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k_by_key: k must be an integral literal, got ${third.dataType.simpleString}")
    else third.eval(null) match {
      case n: java.lang.Number
          if n.longValue() > 0 && n.longValue() <= Int.MaxValue =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bottom_k_by_key: k must be a positive int-range literal, got $other")
    }
  }

  private lazy val k: Int = third.eval(null) match {
    case n: java.lang.Number if n.intValue() > 0 => n.intValue()
    case other => throw new IllegalArgumentException(
      s"bottom_k_by_key: k must be a positive integer literal, got $other")
  }

  override def prettyName: String = "bottom_k_by_key"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buffer: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val keyV = first.eval(input)
    val idV = second.eval(input)
    if (keyV != null && idV != null)
      buffer.add(keyV.asInstanceOf[Number].longValue(),
        idV.asInstanceOf[Number].longValue())
    buffer
  }

  override def merge(buffer: BottomKBuffer, input: BottomKBuffer): BottomKBuffer =
    buffer.mergeIn(input)

  override def eval(buffer: BottomKBuffer): Any =
    new GenericArrayData(buffer.sortedIds)

  override def serialize(buffer: BottomKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(storageFormat: Array[Byte]): BottomKBuffer =
    BottomKBuffer.fromBytes(k, storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BottomKByKey =
    copy(first = newFirst, second = newSecond, third = newThird)
}
