package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled random-hyperplane LSH signature: `graft_embsig(e)` →
  * 32-char '1'/'0' string over a 64-dim `array<double>`.
  *
  * Bit-for-bit the SQL formulation [[graft.operators.Hashing.embSigExpr]]
  * carried since r4 (and the DuckDB oracles still mirror):
  * {{{
  *   concat_ws('', transform(planes, pl ->
  *     IF(aggregate(zip_with(e, pl, (x, y) -> x * y), 0D, (s, v) -> s + v) > 0, '1', '0')))
  * }}}
  * The loop multiplies and left-fold-adds in the same order per plane
  * (`((0 + e0·p0) + e1·p1) + …`), so the projection doubles — and
  * therefore the sign bits — are IEEE-identical (EmbSigSpec pins it
  * on real embeddings). Null semantics mirror the HOF chain: a vector
  * shorter/longer than a plane pads with nulls in zip_with, whose
  * product nulls, whose fold nulls, which IF() renders as the '0'
  * branch being skipped — concretely, aggregate yields NULL and IF
  * (NULL > 0) is false → '0'; the compiled twin reproduces exactly
  * that (a length mismatch contributes '0' per plane; a null element
  * likewise nulls that plane's fold → '0').
  *
  * Why (r19 optimization round, guide §4): the HOF form evaluates
  * 32 planes x 64 dims of interpreted lambda per ROW with two array
  * allocations per plane — the dominant per-row cost of ss02/ss05's
  * banding, dc04's semantic split and dd06's group signatures.
  * CodegenFallback, like [[MinHashSig]]: the loop is already compiled
  * Scala; the surrounding projection stays codegen'd.
  */
final case class EmbSig(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_embsig expects array<double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    val planes = EmbSig.Planes
    val bits = new Array[Char](32)
    var p = 0
    while (p < 32) {
      val pl = planes(p)
      // zip_with pads to max(n, 64); any padded/null slot nulls the
      // fold, and IF(NULL > 0) takes the else branch → '0'
      var bit = '0'
      if (n == 64) {
        var s = 0.0
        var j = 0
        var sawNull = false
        while (j < 64 && !sawNull) {
          if (e.isNullAt(j)) sawNull = true
          else { s += e.getDouble(j) * pl(j); j += 1 }
        }
        if (!sawNull && s > 0) bit = '1'
      }
      bits(p) = bit
      p += 1
    }
    UTF8String.fromString(new String(bits))
  }

  override protected def withNewChildInternal(newChild: Expression): EmbSig =
    copy(child = newChild)

  override def prettyName: String = "graft_embsig"
}

object EmbSig {
  /** The same md5-derived ±1 plane constants the SQL dialect inlines. */
  private val Planes: Array[Array[Double]] =
    graft.operators.Hashing.planes.map(_.map(_.toDouble).toArray).toArray
}
