package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable buffer for [[GramianAggregate]]: running count, per-dimension
  * sums, and the upper triangle of the raw second-moment matrix Σ x·xᵀ in
  * row-major order (index of (i ≤ j) = i·D − i·(i−1)/2 + (j − i)). */
final class GramianBuffer(val dim: Int) {
  var n: Long = 0L
  val sums = new Array[Double](dim)
  val tri = new Array[Double](dim * (dim + 1) / 2)
}

/** One-pass count + mean + Gramian aggregate for PCA fitting
  * (SURVEY.md §2c X3; [[graft.operators.Pca.fit]]).
  *
  * The round-6 fit derived second moments from a double `posexplode` —
  * correct, and its two-phase aggregation shuffles only D² keys, but the
  * map side materializes D(D+1)/2 intermediate ROWS per input vector
  * (~524k at D=1024). This aggregate keeps the same D²-bounded shuffle
  * (each partition emits ONE buffer: 8 + 8·D + 8·D(D+1)/2 bytes — 16 KB at
  * D=64, 4 MB at D=1024) with zero row blow-up, and folds the count and
  * mean passes into the same scan: fit is ONE job over the corpus instead
  * of three over a persisted projection. Parity with the explode
  * formulation is pinned in PcaSpec.
  *
  * Input contract (matches `Pca.fit`'s filter): NULL vectors, wrong-length
  * vectors, and vectors containing a NULL element are skipped — a vector
  * contributing to some accumulators but not others would skew the
  * covariance silently. Accumulation order inside a partition is input
  * order; merge order across partitions is Spark's — associativity of
  * double addition is approximate as in every built-in double aggregate
  * (`sum`, `avg`), which the explode formulation also relied on. */
case class GramianAggregate(
    child: Expression,
    dimExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuffer] {

  override def children: Seq[Expression] = Seq(child, dimExpr)
  override def prettyName: String = "graft_gramian"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      if (!dimExpr.foldable || !dimExpr.dataType.isInstanceOf[IntegerType])
        TypeCheckResult.TypeCheckFailure(s"$prettyName dim must be a literal INT")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  @transient private lazy val dim: Int = dimExpr.eval().asInstanceOf[Int]
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(DoubleType, containsNull = false)),
    StructField("tri", ArrayType(DoubleType, containsNull = false))))

  override def createAggregationBuffer(): GramianBuffer = new GramianBuffer(dim)

  override def update(buf: GramianBuffer, input: InternalRow): GramianBuffer = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != dim) return buf
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return buf
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    buf.n += 1L
    var idx = 0
    i = 0
    while (i < dim) {
      buf.sums(i) += x(i)
      val xi = x(i)
      var j = i
      while (j < dim) {
        buf.tri(idx) += xi * x(j)
        idx += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: GramianBuffer, b: GramianBuffer): GramianBuffer = {
    a.n += b.n
    var i = 0
    while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < a.tri.length) { a.tri(i) += b.tri(i); i += 1 }
    a
  }

  override def eval(buf: GramianBuffer): Any =
    InternalRow(buf.n, new GenericArrayData(buf.sums.clone()),
      new GenericArrayData(buf.tri.clone()))

  override def serialize(buf: GramianBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * (buf.sums.length + buf.tri.length))
    bb.putLong(buf.n)
    buf.sums.foreach(bb.putDouble)
    buf.tri.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramianBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new GramianBuffer(dim)
    buf.n = bb.getLong()
    var i = 0
    while (i < buf.sums.length) { buf.sums(i) = bb.getDouble(); i += 1 }
    i = 0
    while (i < buf.tri.length) { buf.tri(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramianAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramianAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramianAggregate =
    copy(child = newChildren(0), dimExpr = newChildren(1))
}
