package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap grouped top-k as a native Catalyst aggregate — the
  * UDAF-surface member of the expression layer (scalar expressions:
  * [[CosineDistance]] etc.; this is the aggregate side).
  *
  * `topk_pairs(ord, id, k)` keeps, per group, the `k` smallest
  * (ord, id) pairs — "k nearest per category", the hard-negative /
  * example-mining shape. The window formulation
  * (`row_number over (partition by g order by ord) <= k`) must SORT
  * every group's full row set under one exchange; this aggregate keeps a
  * size-k heap per group per task, so map-side partial aggregation
  * bounds the exchange at k rows per group PER TASK and no sort ever
  * sees more than k elements. At 100 TB — groups of millions of rows,
  * k of tens — the window's per-group sort is the difference between a
  * shuffle of everything and a shuffle of k·tasks rows.
  *
  * Buffer: a max-heap ordered by (ord, id) with the WORST pair at the
  * head — admit when under capacity or better than the head, then evict.
  * Null ord or id rows are skipped. `eval` returns the heap sorted
  * ascending as `ARRAY<STRUCT<ord: DOUBLE, id: BIGINT>>` —
  * deterministic under any partitioning or merge order (the kept SET is
  * partition-independent; ties break on id). */
case class TopKPairs(
    ordExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k >= 1 && k <= (1 << 20), s"topk_pairs: need 1 <= k <= 2^20, got $k")

  // update() casts eval results to Double/Long — enforce the exact types
  // at ANALYSIS time so FLOAT/INT/DECIMAL inputs fail with a message (the
  // construction helpers wrap arguments in Cast, so user-facing surfaces
  // coerce; only a direct mistyped construction reaches this failure)
  // instead of ClassCastException-ing inside the executor
  override def checkInputDataTypes(): TypeCheckResult =
    if (ordExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "topk_pairs requires (DOUBLE ord, BIGINT id), got (" +
        s"${ordExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")

  // max-heap: head = worst (largest) kept pair, the eviction candidate
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
      p: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(p)
    else if (worstFirst.lt(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null)
      add(buf, (o.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(worstFirst)
      .map { case (o, i) => InternalRow(o, i): Any })

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (o, i) => bb.putDouble(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "topk_pairs"
}
