package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled twins of the text-hashing SQL formulations in
  * [[graft.operators.Dedup]] — same outputs bit-for-bit (specs pin the
  * equivalence), but one JVM loop per row instead of interpreted
  * higher-order-function lambdas per element.
  */

/** `graft_shingles(text)` → distinct word-trigram shingles, in first-
  * occurrence order — exactly `array_distinct(transform(...))` over
  * `split(text, ' ')` (which keeps empty tokens, Java `split(re, -1)`).
  */
final case class Shingles(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_shingles expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}

/** `graft_simhash64(tokens)` → 64-char '1'/'0' SimHash string: per
  * token, `h1`/`h2` are the first/second 8 hex digits of `md5(token)`;
  * bit `b` reads `(b < 32 ? h1 >> b : h2 >> (b-32)) & 1`, contributing
  * ±1 to the per-bit sum; a positive sum renders '1'.
  */
final case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"graft_simhash64 expects array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val acc = new Array[Long](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val d = md.digest(arr.getUTF8String(i).getBytes)
      md.reset()
      val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) {
        acc(b) += (if (((h1 >> b) & 1L) == 1L) 1L else -1L)
        acc(b + 32) += (if (((h2 >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    val bits = new Array[Char](64)
    var b = 0
    while (b < 64) { bits(b) = if (acc(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromString(new String(bits))
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

/** One-stop idempotent registration of the graft function family. */
object GraftFunctions {
  // sessions already registered — every builder calls register() so a
  // bench/verify run would otherwise re-register 4 functions per query,
  // and each replacement logs a WARN line into the stdout tail the
  // driver parses for the bench JSON. Weak keys: sessions must stay
  // collectable.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Arity guard: a wrong-arity SQL call must surface as an analysis
    * error naming the expected signature, not an
    * IndexOutOfBoundsException from `children(i)` deep in the builder.
    */
  private def arity(name: String, signature: String, n: Int)(
      children: Seq[Expression]): Seq[Expression] = {
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        // expectedNum must stay purely numeric — prose here renders as
        // "requires 1 — expected ... parameters"; the signature rides in
        // functionName instead, which the template quotes verbatim
        messageParameters = Map(
          "functionName" -> s"`$signature`",
          "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    children
  }

  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("graft_minhash_sig",
        { children: Seq[Expression] =>
          MinHashSig(arity("graft_minhash_sig", "graft_minhash_sig(shingles)", 1)(children).head) },
        "built-in")
      reg.createOrReplaceTempFunction("graft_shingles",
        { children: Seq[Expression] =>
          Shingles(arity("graft_shingles", "graft_shingles(text)", 1)(children).head) },
        "built-in")
      reg.createOrReplaceTempFunction("graft_simhash64",
        { children: Seq[Expression] =>
          SimHash64(arity("graft_simhash64", "graft_simhash64(text)", 1)(children).head) },
        "built-in")
      reg.createOrReplaceTempFunction("graft_cosine",
        { children: Seq[Expression] =>
          val c = arity("graft_cosine", "graft_cosine(a, b)", 2)(children)
          CosineSim(c.head, c(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_il2",
        { children: Seq[Expression] =>
          val c = arity("graft_il2", "graft_il2(a, b)", 2)(children)
          IntSqL2(c.head, c(1)) }, "built-in")
      reg.createOrReplaceTempFunction("graft_embsig",
        { children: Seq[Expression] =>
          EmbSig(arity("graft_embsig", "graft_embsig(e)", 1)(children).head) }, "built-in")
      reg.createOrReplaceTempFunction("graft_idot",
        { children: Seq[Expression] =>
          val c = arity("graft_idot", "graft_idot(a, b)", 2)(children)
          IntDot(c.head, c(1)) }, "built-in")
      // Spark ships bloom_filter_agg / might_contain as INTERNAL
      // functions (catalyst's InjectRuntimeFilter plants them when it
      // builds runtime row-filters; they are absent from the public
      // registry). Re-exposing the same expressions lets a query spell
      // the runtime-filter pattern explicitly — build a bloom over the
      // selective side's join key hashes, probe it at the fact scan —
      // with codegen'd catalyst expressions, not a reimplementation.
      reg.createOrReplaceTempFunction("graft_bloom_agg",
        { children: Seq[Expression] =>
          val c = arity("graft_bloom_agg",
            "graft_bloom_agg(keyHash, estimatedItems, numBits)", 3)(children)
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
            c.head, c(1), c(2)).toAggregateExpression() }, "built-in")
      reg.createOrReplaceTempFunction("graft_might_contain",
        { children: Seq[Expression] =>
          val c = arity("graft_might_contain",
            "graft_might_contain(bloom, keyHash)", 2)(children)
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            c.head, c(1)) }, "built-in")
    }
}
