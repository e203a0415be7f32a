package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity for embedding columns (SURVEY.md §2c X2/X3).
  *
  * The higher-order-function formulation ([[graft.functions.Vectors.cosine]])
  * evaluates its lambdas interpreted per ELEMENT — fine for scoring a few
  * thousand candidates, ruinous for pairwise passes (an exact self-join at
  * 2k vectors is 2M pairs × 64 dims × 3 lambda calls). This expression makes
  * one call per row and folds in a primitive loop.
  *
  * Fold order is left-to-right in double precision — bit-identical to the
  * HOF form AND to DuckDB's `list_sum(list_transform(...))`, so oracle
  * queries can compare exact values (VectorExprSpec pins both equivalences).
  */
case class CosineSimilarityExpr(a: Expression, b: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cosine"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val aFloat = elemIsFloat(a)
  @transient private lazy val bFloat = elemIsFloat(b)

  override def nullSafeEval(x: Any, y: Any): Any = {
    val va = x.asInstanceOf[ArrayData]
    val vb = y.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (vb.numElements() != n) return null // zip_with would null-pad → null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xa = if (aFloat) va.getFloat(i).toDouble else va.getDouble(i)
      val xb = if (bFloat) vb.getFloat(i).toDouble else vb.getDouble(i)
      dot += xa * xb
      na += xa * xa
      nb += xb * xb
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimilarityExpr = copy(a = l, b = r)
}
