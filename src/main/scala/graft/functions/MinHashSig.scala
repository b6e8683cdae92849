package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled MinHash signature: `graft_minhash_sig(shingles)` →
  * `array<bigint>` of 32 minhash values.
  *
  * Bit-for-bit the same arithmetic as the SQL-dialect formulation in
  * [[graft.operators.Dedup]] (and therefore the same as the DuckDB
  * oracle): per shingle, `h1`/`h2` are the first/second 7 hex digits of
  * `md5(shingle)` (28 bits each), and permutation `p` contributes
  * `(a_p·h1 + b_p·h2 + c_p) mod (2^31−1)`; the signature is the
  * per-permutation minimum. `MinHashSigSpec` pins the equivalence
  * against the interpreted SQL expression.
  *
  * Why a custom `Expression`: the SQL form nests lambdas
  * (`transform(perms, t -> array_min(transform(hs, ...)))`), and
  * higher-order-function lambdas evaluate interpreted, row by row,
  * outside whole-stage codegen — ~32·|shingles| boxed evaluations per
  * document. This one-pass compiled loop does the identical math at
  * JVM speed (CodegenFallback: the surrounding projection stays
  * codegen'd; the loop itself is already compiled Scala).
  */
final case class MinHashSig(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_minhash_sig expects array<string>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null // parity with array_min over an empty array
    val a = MinHashSig.A; val b = MinHashSig.B; val c = MinHashSig.C
    val sig = Array.fill(32)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val d = md.digest(arr.getUTF8String(i).getBytes)
      md.reset()
      // first 7 hex digits = bytes 0-2 + high nibble of byte 3;
      // next 7 hex digits = low nibble of byte 3 + bytes 4-6
      val h1 = ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
        ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >> 4)
      val h2 = ((d(3) & 0x0fL) << 24) | ((d(4) & 0xffL) << 16) |
        ((d(5) & 0xffL) << 8) | (d(6) & 0xffL)
      var p = 0
      while (p < 32) {
        val v = (a(p) * h1 + b(p) * h2 + c(p)) % 2147483647L
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  // the same md5-derived permutation constants the SQL dialect inlines
  private val A = graft.operators.Hashing.perms.map(_._1).toArray
  private val B = graft.operators.Hashing.perms.map(_._2).toArray
  private val C = graft.operators.Hashing.perms.map(_._3).toArray

  /** Idempotently register `graft_minhash_sig` on the session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      { children: Seq[Expression] => MinHashSig(children.head) },
      "built-in")
}
