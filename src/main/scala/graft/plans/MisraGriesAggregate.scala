package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable buffer for [[MisraGriesAggregate]]: the bounded counter table and
  * the total number of (non-null) tokens folded in — the latter is what the
  * caller needs to evaluate the deterministic error bound n/(cap+1). */
final class MgBuffer {
  val counts = new mutable.HashMap[String, Long]
  var n: Long = 0L
}

/** `graft_mg_sketch(token STRING, capacity INT)` →
  * `STRUCT<n: BIGINT, items: ARRAY<STRUCT<term: STRING, est: BIGINT>>>`:
  * a Misra–Gries heavy-hitter summary (Misra & Gries '82; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * State is ≤ `capacity` counters regardless of input size — the map-side
  * partial aggregate ships one O(capacity) buffer per partition instead of
  * the full token frequency table, which is the whole point at 100 TB: the
  * shuffle is `partitions × capacity` rows, independent of vocabulary size.
  *
  * Guarantees (the spec pins both on a skewed fixture):
  *   - `est ≤ true ≤ est + n/(capacity+1)` for every surviving term;
  *   - every term with `true > n/(capacity+1)` IS in the summary.
  * If `sum(est) == n`, no count was ever discarded and the summary is the
  * EXACT frequency table (the under-capacity vocabulary case).
  *
  * Update rule: increment a present counter; insert at 1 when below
  * capacity; otherwise decrement ALL counters by one (dropping zeros) —
  * each such event retires capacity+1 occurrences, which is where the
  * n/(capacity+1) bound comes from. Merge rule: add the two tables, then
  * if over capacity subtract the (capacity+1)-th largest value from every
  * counter and drop the non-positive ones — the mergeable-summaries rule
  * that preserves the same bound under Spark's arbitrary merge trees.
  * NULL tokens are skipped (they count toward nothing, including `n`).
  */
case class MisraGriesAggregate(
    child: Expression,
    capExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child, capExpr)
  override def prettyName: String = "graft_mg_sketch"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (!capExpr.foldable || !capExpr.dataType.isInstanceOf[IntegerType])
        TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must be a literal INT")
      else if (capExpr.eval().asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(s"$prettyName capacity must be >= 1")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING tokens, got ${other.simpleString}")
  }

  @transient private lazy val cap: Int = capExpr.eval().asInstanceOf[Int]

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("items", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false))))

  override def createAggregationBuffer(): MgBuffer = new MgBuffer

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    // UTF8String may view a reused backing buffer — materialize a JVM String
    val s = v.asInstanceOf[UTF8String].toString
    buf.n += 1L
    buf.counts.get(s) match {
      case Some(c) => buf.counts.update(s, c + 1L)
      case None =>
        if (buf.counts.size < cap) buf.counts.update(s, 1L)
        else buf.counts.filterInPlace((_, c) => c > 1L)
          .mapValuesInPlace((_, c) => c - 1L)
    }
    buf
  }

  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    a.n += b.n
    b.counts.foreach { case (t, c) =>
      a.counts.update(t, a.counts.getOrElse(t, 0L) + c)
    }
    if (a.counts.size > cap) {
      // subtract the (cap+1)-th largest count from everything, drop <= 0
      val vals = a.counts.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (cap + 1))
      a.counts.filterInPlace((_, c) => c > cut)
        .mapValuesInPlace((_, c) => c - cut)
    }
    a
  }

  override def eval(buf: MgBuffer): Any = {
    // deterministic output order: estimate desc, then term asc
    val items = buf.counts.toArray.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => InternalRow(UTF8String.fromString(t), c) }
    InternalRow(buf.n, new GenericArrayData(items.asInstanceOf[Array[Any]]))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, c) =>
      val bytes = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MgBuffer
    buf.n = in.readLong()
    val size = in.readInt()
    var i = 0
    while (i < size) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.counts.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggregate =
    copy(child = newChildren(0), capExpr = newChildren(1))
}
