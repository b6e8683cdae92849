package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  *
  * Implements `doGenCode` (r10): this expression sits inside the
  * rerank/assignment projections of ss01/ss05/dd06/dd09 — as a
  * CodegenFallback every row paid a boxed interpreted call INSIDE an
  * otherwise codegen'd stage; the generated loop is the same arithmetic
  * in the same order (bit-identical — the spec compares against the
  * interpreted path too), emitted directly into the whole-stage span.
  */
final case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Always nullable: a length mismatch yields null even when both
    * children are non-nullable (the zip_with padding contract). Without
    * this, non-nullable inputs (array literals — ss03's centroid side)
    * made `nullSafeCodeGen` take its non-nullable branch, which never
    * declares `ev.isNull` — the generated `isNull_x = true;` then
    * referenced an undeclared variable and the whole stage silently
    * fell back to interpreted (r11 fix; regression-pinned in
    * CosineSimSpec under CODEGEN_ONLY).
    */
  override def nullable: Boolean = true

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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // same multiplies, same left-fold order as nullSafeEval — the
      // codegen and interpreted paths must stay bit-identical
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xi = $a.getDouble($i);
         |    final double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  ${ev.value} = $dot / java.lang.Math.sqrt($na * $nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}
