package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable buffer for [[TopKAggregate]]: a bounded heap whose HEAD is the
  * worst kept (score, id) pair under the descending (score, id) order — so
  * one `dequeue()` evicts exactly the entry a better arrival displaces. */
final class TopKBuffer {
  // PriorityQueue's head is the maximum under its ordering; reversing the
  // natural (score, id) order makes the head the MINIMUM — the eviction
  // candidate. Duplicate pairs are kept (a heap, not a set), so duplicated
  // input ids degrade to duplicated output rows, never lost rows.
  val heap: mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](
      Ordering.Tuple2[Double, Long](Ordering.Double.TotalOrdering, Ordering.Long).reverse)
}

/** `graft_topk(score DOUBLE, id BIGINT, k INT)` →
  * `ARRAY<STRUCT<score: DOUBLE, id: BIGINT>>`: the k largest (score, id)
  * pairs of the group, descending — ties on score broken by larger id, so
  * the result is deterministic whenever ids are unique.
  *
  * This is top-k-per-group WITHOUT any sort. Spark's own
  * `InferWindowGroupLimit` (3.5+) already bounds the ubiquitous
  * `ROW_NUMBER() OVER (...) <= k` spelling's shuffle with a partial
  * WindowGroupLimit — but only AFTER a full local sort of every map
  * partition (O(n log n) per partition, rows at full width), and only when
  * the rank filter is statically recognizable in the plan. Here the
  * partial-aggregate state is a bounded k-entry heap: one O(log k) heap op
  * per row, no local sort, hash (not sort-based) aggregation, and
  * `groups × partitions × k` narrow (score, id) rows on the shuffle.
  * It is also an explicit relational surface — composable where the
  * window-filter pattern can't be expressed or recognized (top-k inside a
  * larger aggregation, dynamic k per call site, streaming state).
  *
  * Rows where score OR id is NULL are skipped (SQL aggregates ignore
  * NULLs; a NULL score is unrankable). NaN scores order via the IEEE total
  * order (NaN > +Inf), matching Spark SQL's own NaN-greatest sort
  * semantics. Payload columns beyond the id are NOT carried — explode the
  * result and join back on id (the narrow-shuffle pattern every dedup op
  * here uses).
  */
case class TopKAggregate(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def prettyName: String = "graft_topk"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (scoreExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) =>
        if (!kExpr.foldable || !kExpr.dataType.isInstanceOf[IntegerType])
          TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a literal INT")
        else if (kExpr.eval().asInstanceOf[Int] < 1)
          TypeCheckResult.TypeCheckFailure(s"$prettyName k must be >= 1")
        else TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (DOUBLE score, BIGINT id), got " +
          s"(${s.simpleString}, ${i.simpleString})")
    }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s == null || i == null) return buf
    buf.heap += ((s.asInstanceOf[Double], i.asInstanceOf[Long]))
    if (buf.heap.size > k) buf.heap.dequeue()
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    b.heap.foreach { e =>
      a.heap += e
      if (a.heap.size > k) a.heap.dequeue()
    }
    a
  }

  override def eval(buf: TopKBuffer): Any = {
    val arr = buf.heap.toArray
    java.util.Arrays.sort(arr, Ordering.Tuple2[Double, Long](
      Ordering.Double.TotalOrdering, Ordering.Long).reverse)
    new GenericArrayData(
      arr.map { case (s, i) => InternalRow(s, i) }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new TopKBuffer
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.heap += ((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggregate =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
