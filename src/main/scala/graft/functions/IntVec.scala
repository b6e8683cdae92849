package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Compiled integer-vector kernels for the similarity family —
  * `graft_il2(a, b)` (squared L2) and `graft_idot(a, b)` (dot product)
  * over two `array<bigint>` columns.
  *
  * Exact twins of the HOF formulations the ss operators shipped since
  * r7 (and the DuckDB oracles still mirror):
  * {{{
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v)
  *   aggregate(zip_with(a, b, (x, y) -> x * y),             0L, (s, v) -> s + v)
  * }}}
  * Integer math is order-free and exact, so the compiled loop is
  * bit-identical by construction; IntVecSpec pins it against the HOF
  * text anyway (the CosineSim discipline). Null semantics mirror the
  * HOF chain exactly: a length mismatch nulls the result (zip_with's
  * padding), and ANY null element nulls it too (the lambda's null
  * propagation poisons the fold).
  *
  * Why this exists (r19 optimization round, guide §4): zip_with +
  * aggregate are CodegenFallback-class higher-order functions — every
  * evaluation allocates an intermediate 64-slot array and runs two
  * interpreted lambda folds. il2 sits inside the HOT pairs of the
  * entire family: the corpus x query truth scans of the batched serves
  * (ss18-ss24: corpus x 186 queries x 64 dims at sf0.1), the
  * encodeAssign/encodePq store builds, every rerank, and ss10/ss17's
  * Lloyd rounds. One compiled loop per pair removes the allocation and
  * the boxing, inside the whole-stage span.
  */
abstract class IntVecFold extends BinaryExpression {

  override def dataType: DataType = LongType

  /** Always nullable — the length-mismatch null exists even for
    * non-nullable children (CosineSim's r11 lesson: without this the
    * non-nullable codegen branch references an undeclared isNull and
    * the stage silently falls back to interpreted).
    */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName expects two array<bigint>, got $other")
    }

  /** The per-element term, codegen side: an expression in `x`/`y`. */
  protected def termCode(x: String, y: String): String

  /** The per-element term, interpreted side. */
  protected def term(x: Long, y: Long): Long

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // zip_with pads the shorter side with nulls → the fold goes null
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      // a null element nulls the zipped slot, which poisons the fold
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += term(x.getLong(i), y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      // same adds in the same order as nullSafeEval (exact anyway —
      // integer math — but the discipline is the family's)
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $xi = $a.getLong($i);
         |    final long $yi = $b.getLong($i);
         |    $acc += ${termCode(xi, yi)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

/** `graft_il2(a, b)` — integer squared L2 distance. */
final case class IntSqL2(left: Expression, right: Expression) extends IntVecFold {
  override protected def term(x: Long, y: Long): Long = { val d = x - y; d * d }
  override protected def termCode(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntSqL2 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_il2"
}

/** `graft_idot(a, b)` — integer dot product. */
final case class IntDot(left: Expression, right: Expression) extends IntVecFold {
  override protected def term(x: Long, y: Long): Long = x * y
  override protected def termCode(x: String, y: String): String = s"$x * $y"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_idot"
}
