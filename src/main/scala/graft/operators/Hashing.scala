package graft.operators

/** Deterministic md5-derived hash constants shared by the dedup and
  * similarity operators.
  *
  * Everything here is computed once in Scala and inlined as **literals**
  * into both the Spark expressions and the DuckDB oracle SQL, so the
  * two engines evaluate identical arithmetic — md5 is the only digest
  * both implement bit-identically, which is what makes the LSH family
  * oracle-checkable (no `no_oracle` escape hatches).
  */
private[graft] object Hashing {

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def md5Long(seed: String, hexLen: Int): Long =
    java.lang.Long.parseLong(md5Hex(seed).take(hexLen), 16)

  /** Modulus for the universal-hash family (Mersenne prime 2^31-1). */
  val P = 2147483647L

  /** 32 minhash permutations (a, b, c), each component 28 bits so
    * a·h1 + b·h2 + c stays well under 2^63 (ANSI-overflow-safe).
    */
  val perms: Seq[(Long, Long, Long)] =
    (0 until 32).map(i => (md5Long(s"a$i", 7), md5Long(s"b$i", 7), md5Long(s"c$i", 7)))

  /** 32 Rademacher (±1) hyperplanes over dim-64 embeddings, sign taken
    * from one md5 bit per (plane, component). ±1 components keep the
    * projections free of multiplication rounding, and `0 + x1 + x2 + …`
    * left-folds identically in Spark (`aggregate`) and DuckDB
    * (`list_reduce`), so the sign bits are bit-identical across engines.
    * 32 bits → 8 bands of 4: recall@10 ≳ 0.7 for sim ≈ 0.4 neighbors
    * (1 − (1 − p_band)^8), with candidate generation still a bucketed
    * equi-join.
    */
  val planes: Seq[Seq[Int]] =
    (0 until 32).map(p => (0 until 64).map(j =>
      if ((java.lang.Integer.parseInt(md5Hex(s"hp:$p:$j").take(1), 16) & 1) == 1) 1 else -1))

  val planesSpark: String = planes.map(pl =>
    pl.map(v => s"${v}D").mkString("array(", ",", ")")).mkString("array(", ", ", ")")

  val planesDuck: String = planes.map(pl =>
    pl.map(v => s"$v.0").mkString("[", ",", "]")).mkString("[", ", ", "]")

  /** 32-char '1'/'0' hyperplane signature of double-array column `e`
    * (Spark SQL dialect). Compiled ([[graft.functions.EmbSig]], r19
    * optimization round): the HOF text this replaces ran 32 planes x
    * 64 dims of interpreted lambda per row; EmbSigSpec pins the
    * compiled twin bit-identical to it. Callers must have
    * GraftFunctions registered (every consumer site does).
    */
  val embSigExpr: String = "graft_embsig(e)"

  /** The r4-r18 HOF formulation, kept verbatim for EmbSigSpec's
    * bit-identity pin (the oracles still mirror this arithmetic).
    */
  val embSigHofExpr: String =
    s"""concat_ws('', transform($planesSpark, pl ->
       |  IF(aggregate(zip_with(e, pl, (x, y) -> x * y), 0D, (s, v) -> s + v) > 0, '1', '0')))""".stripMargin

  /** DuckDB twin of [[embSigExpr]], assuming `e DOUBLE[]` and a CTE
    * `pl(planes)` holding [[planesDuck]].
    */
  val embSigDuck: String =
    """ARRAY_TO_STRING(LIST_TRANSFORM(planes, p ->
      |  CASE WHEN LIST_REDUCE(LIST_TRANSFORM(RANGE(1, 65), i -> e[i] * p[i]),
      |                        (a, b) -> a + b) > 0
      |       THEN '1' ELSE '0' END), '')""".stripMargin
}
