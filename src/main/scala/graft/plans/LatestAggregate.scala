package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** Mutable buffer for [[LatestAggregate]]: the single best (version,
  * payload) pair seen so far, stored as one UnsafeRow copy — or null before
  * the first non-null version arrives. */
final class LatestBuffer {
  var row: UnsafeRow = null
}

/** `graft_latest(version ANY-ORDERABLE, payload ANY)` → payload's type: the
  * payload of the row whose `version` is MAXIMAL in the group — the
  * keep-latest/compaction kernel behind
  * [[graft.operators.Dedup.keepLatest]].
  *
  * Why not `max_by`? Spark's `max_by` over a struct version key is a
  * declarative aggregate with an immutable buffer type, so it plans as
  * SortAggregate: every map partition SORTS its full input by the grouping
  * key before the partial aggregate, and the final side sorts again. This
  * TypedImperativeAggregate keeps ONE buffered row per (group, partition)
  * and plans as ObjectHashAggregate — no sort on either side, partial
  * aggregation still bounds the shuffle at one narrow row per key per
  * partition. Same trade the Misra–Gries and top-k aggregates make.
  *
  * Semantics: rows whose `version` evaluates to NULL are skipped; a
  * version STRUCT with NULL fields participates under Spark's struct
  * ordering (null field sorts first, so it loses to any non-null value at
  * that field). Ties keep the first-seen row — pass a version that totally
  * orders rows (e.g. append a unique id) for determinism, the same
  * contract as `keepLatest`. */
case class LatestAggregate(
    version: Expression,
    payload: Expression,
    earliest: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestBuffer] {

  override def children: Seq[Expression] = Seq(version, payload)
  override def prettyName: String = if (earliest) "graft_earliest" else "graft_latest"
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!RowOrdering.isOrderable(version.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: version type ${version.dataType.simpleString} is not orderable")
    else TypeCheckResult.TypeCheckSuccess

  // `earliest = true` flips the comparison: the MINIMAL version's payload
  // is kept — the keep-first dedup kernel (graft_earliest), same sort-free
  // plan. Ties still keep the first-seen row in both modes.
  @transient private lazy val ordering: Ordering[Any] = {
    val asc = TypeUtils.getInterpretedOrdering(version.dataType)
    if (earliest) asc.reverse else asc
  }
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(version.dataType, payload.dataType))
  @transient private lazy val scratch = new GenericInternalRow(2)

  override def createAggregationBuffer(): LatestBuffer = new LatestBuffer

  private def storedVersion(buf: LatestBuffer): Any =
    buf.row.get(0, version.dataType)

  override def update(buf: LatestBuffer, input: InternalRow): LatestBuffer = {
    val v = version.eval(input)
    if (v == null) return buf
    if (buf.row == null || ordering.compare(v, storedVersion(buf)) > 0) {
      scratch.update(0, v)
      scratch.update(1, payload.eval(input))
      buf.row = proj.apply(scratch).copy()
    }
    buf
  }

  override def merge(a: LatestBuffer, b: LatestBuffer): LatestBuffer = {
    if (b.row != null &&
        (a.row == null || ordering.compare(storedVersion(b), storedVersion(a)) > 0))
      a.row = b.row
    a
  }

  override def eval(buf: LatestBuffer): Any =
    if (buf.row == null) null else buf.row.get(1, payload.dataType)

  override def serialize(buf: LatestBuffer): Array[Byte] =
    if (buf.row == null) Array.emptyByteArray else buf.row.getBytes

  override def deserialize(bytes: Array[Byte]): LatestBuffer = {
    val buf = new LatestBuffer
    if (bytes.nonEmpty) {
      val r = new UnsafeRow(2)
      r.pointTo(bytes, bytes.length)
      buf.row = r
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): LatestAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): LatestAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LatestAggregate =
    copy(version = newChildren(0), payload = newChildren(1))
}
