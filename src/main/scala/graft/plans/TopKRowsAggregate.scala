package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Mutable buffer for [[TopKRowsAggregate]]: a bounded heap of combined
  * (order, payload) UnsafeRow copies whose HEAD is the minimal order value
  * — the eviction candidate when a better row arrives. */
final class TopKRowsBuffer(ord: Ordering[Any], orderType: DataType) {
  val heap: mutable.PriorityQueue[UnsafeRow] =
    mutable.PriorityQueue.empty[UnsafeRow](
      Ordering.by[UnsafeRow, Any](_.get(0, orderType))(ord).reverse)
}

/** `graft_topk_rows(order ANY-ORDERABLE, payload ANY, k INT)` →
  * `ARRAY<payload type>`: the payloads of the k rows whose `order` value is
  * maximal in the group, descending — the FULL-ROW sibling of
  * [[TopKAggregate]] (which carries only (score, id) and expects a
  * join-back for payload). Partial state is a bounded k-row heap per
  * (group, partition); the plan is ObjectHashAggregate — no sort anywhere,
  * and no second shuffle to re-attach payload columns.
  *
  * Use the narrow [[TopKAggregate]] when payloads are fat and k·groups is
  * large (the heap rows ride the shuffle); use this form when the point is
  * one-shot top-k rows (the common case for per-domain document caps).
  *
  * Rows with a NULL `order` are skipped. Determinism: `order` must totally
  * order rows within a group (include a unique id as its last field); with
  * ties, which equal-valued row survives depends on arrival order. */
case class TopKRowsAggregate(
    order: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  override def children: Seq[Expression] = Seq(order, payload, kExpr)
  override def prettyName: String = "graft_topk_rows"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payload.dataType, containsNull = payload.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(order.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: order type ${order.dataType.simpleString} is not orderable")
    else if (!kExpr.foldable || !kExpr.dataType.isInstanceOf[IntegerType])
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal INT")
    else if (kExpr.eval().asInstanceOf[Int] < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(order.dataType)
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(order.dataType, payload.dataType))
  @transient private lazy val scratch = new GenericInternalRow(2)

  override def createAggregationBuffer(): TopKRowsBuffer =
    new TopKRowsBuffer(ordering, order.dataType)

  override def update(buf: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val v = order.eval(input)
    if (v == null) return buf
    if (buf.heap.size < k ||
        ordering.compare(v, buf.heap.head.get(0, order.dataType)) > 0) {
      scratch.update(0, v)
      scratch.update(1, payload.eval(input))
      buf.heap += proj.apply(scratch).copy()
      if (buf.heap.size > k) buf.heap.dequeue()
    }
    buf
  }

  override def merge(a: TopKRowsBuffer, b: TopKRowsBuffer): TopKRowsBuffer = {
    b.heap.foreach { r =>
      a.heap += r
      if (a.heap.size > k) a.heap.dequeue()
    }
    a
  }

  override def eval(buf: TopKRowsBuffer): Any = {
    val arr = buf.heap.toArray
    java.util.Arrays.sort(arr,
      Ordering.by[UnsafeRow, Any](_.get(0, order.dataType))(ordering).reverse)
    new GenericArrayData(
      arr.map(_.get(1, payload.dataType)).asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKRowsBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.heap.size)
    buf.heap.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val r = new UnsafeRow(2)
      r.pointTo(b, len)
      buf.heap += r
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRowsAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRowsAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAggregate =
    copy(order = newChildren(0), payload = newChildren(1), kExpr = newChildren(2))
}
