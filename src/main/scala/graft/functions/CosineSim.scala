package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled cosine similarity over two `array<double>` columns:
  * `graft_cosine(a, b)`.
  *
  * FP-exact twin of the SQL formulation used everywhere in this repo
  * (and mirrored by the DuckDB oracles):
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v)
  *     / sqrt(aggregate(a, 0D, (s, x) -> s + x*x)
  *            * aggregate(b, 0D, (s, x) -> s + x*x))
  * }}}
  * The loop performs the same multiplies and left-fold additions in the
  * same order, so results are bit-identical (CosineSimSpec pins this) —
  * just without materializing a products array per row pair, which is
  * what makes the interpreted form the rerank bottleneck.
  */
final case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"graft_cosine expects two array<double>, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter side with nulls → null result; mirror that
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}
