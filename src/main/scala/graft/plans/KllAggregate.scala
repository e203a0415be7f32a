package graft.plans

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** `graft_kll_agg(value DOUBLE | sketch BINARY, k INT)` → BINARY: an Apache
  * DataSketches KLL quantile sketch (Karnin–Lang–Liberty, FOCS'16) — the
  * QUANTILES member of the mergeable-sketch roster (HLL = distinct, theta =
  * set algebra, Misra–Gries/CMS = frequency, KLL = distributions). State is
  * O(k·log(n/k)) values regardless of input size, so the map-side partial
  * ships kilobytes per partition and a persisted artifact answers
  * percentile questions about a 100 TB corpus without rescanning it.
  *
  * Two input modes by CHILD TYPE: a DOUBLE child folds raw values (sketch
  * build); a BINARY child merges already-serialized KLL sketches (artifact
  * maintenance — fold a new batch's sketch into the stored one, the same
  * incremental contract as `hll_union_agg`). NULL inputs are skipped.
  *
  * Guarantee: normalized RANK error ≤ `getNormalizedRankError(k)` (~1.65%
  * at the k=200 default, 99% confidence) — a rank-space bound, so the
  * VALUE returned for a quantile is exact for some rank within ±ε of the
  * requested one. Compaction retains odd or even survivors by a random
  * bit, so byte-level output is NOT run-deterministic — the contract is
  * the bound, not reproducible bytes (the HLL HIP precedent, spec-pinned
  * the same way). */
case class KllAggregate(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def prettyName: String = "graft_kll_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType | BinaryType =>
      if (!kExpr.foldable || !kExpr.dataType.isInstanceOf[IntegerType])
        TypeCheckResult.TypeCheckFailure(s"$prettyName k must be a literal INT")
      else {
        val k = kExpr.eval().asInstanceOf[Int]
        if (k < 8 || k > 65535)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName k must be in [8, 65535], got $k")
        else TypeCheckResult.TypeCheckSuccess
      }
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE values or BINARY sketches, " +
        s"got ${other.simpleString}")
  }

  @transient private lazy val k: Int = kExpr.eval().asInstanceOf[Int]
  @transient private lazy val mergeMode: Boolean =
    child.dataType == BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      if (mergeMode)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      else buf.update(v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(offset: Int): KllAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllAggregate =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/** Scalar probes over a serialized KLL sketch. Each call heapifies the
  * bytes — artifact rows are few by construction (one per group), so this
  * is driver-dashboard-priced, not scan-priced. Empty sketches yield NULL
  * (a quantile of nothing is not a number, matching SQL aggregate
  * semantics). */
abstract class KllProbeExpr extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  protected def probe(s: KllDoublesSketch, arg: Double): Any
  override def nullSafeEval(sketchBytes: Any, arg: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else probe(s, arg.asInstanceOf[Double])
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BINARY sketch, DOUBLE), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
}

/** `graft_kll_quantile(sketch, p)` → the value at normalized rank p. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends KllProbeExpr {
  override def prettyName: String = "graft_kll_quantile"
  override protected def probe(s: KllDoublesSketch, p: Double): Any = {
    require(p >= 0.0 && p <= 1.0, s"quantile rank must be in [0,1], got $p")
    s.getQuantile(p)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllQuantileExpr = copy(left = l, right = r)
}

/** `graft_kll_rank(sketch, v)` → the normalized rank of value v. */
case class KllRankExpr(left: Expression, right: Expression)
  extends KllProbeExpr {
  override def prettyName: String = "graft_kll_rank"
  override protected def probe(s: KllDoublesSketch, v: Double): Any =
    s.getRank(v)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllRankExpr = copy(left = l, right = r)
}

object KllAggregate {
  /** The sketch's guaranteed normalized rank error (99% confidence) at
    * parameter k — callers use it to build self-validation bounds. */
  def normalizedRankError(k: Int): Double =
    KllSketch.getNormalizedRankError(k, false)
}
