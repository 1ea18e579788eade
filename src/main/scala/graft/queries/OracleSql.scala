package graft.queries

/** Shared DuckDB renderings of graft's deterministic hash machinery —
  * the UBIGINT/HUGEINT idioms the LlmQueries oracles established
  * (wrapping 64-bit multiplies as split 32×64 products in HUGEINT,
  * xor/shift in UBIGINT), factored for the sketch-suite oracles.
  */
private[queries] object OracleSql {

  val M64 = "18446744073709551616" // 2^64

  /** `z * c mod 2^64` for a UBIGINT SQL expression `z` and an unsigned
    * 64-bit CONSTANT c.
    */
  def mul64(z: String, c: BigInt): String =
    s"CAST(((CAST($z % 4294967296 AS HUGEINT) * $c) + " +
      s"((((CAST($z AS HUGEINT) // 4294967296) * $c) % 4294967296) * 4294967296)) " +
      s"% $M64 AS UBIGINT)"

  /** `z * c mod 2^64` where BOTH operands are UBIGINT SQL expressions:
    * z*c = z_lo*c + ((z_hi*c) mod 2^32)*2^32 (mod 2^64), every product
    * inside HUGEINT range.
    */
  def mulCols(z: String, c: String): String =
    s"CAST(((CAST($z % 4294967296 AS HUGEINT) * CAST($c AS HUGEINT)) + " +
      s"((((CAST($z AS HUGEINT) // 4294967296) * CAST($c AS HUGEINT)) % 4294967296) * 4294967296)) " +
      s"% $M64 AS UBIGINT)"

  /** splitmix64 finalizer over a UBIGINT expression `z0`
    * ([[graft.functions.SamplingImpl.splitmix64]]). Returns UBIGINT.
    */
  def smix64(z0: String): String = {
    val c1 = BigInt("9e3779b97f4a7c15", 16)
    val c2 = BigInt("bf58476d1ce4e5b9", 16)
    val c3 = BigInt("94d049bb133111eb", 16)
    val za = s"CAST((CAST($z0 AS HUGEINT) + $c1) % $M64 AS UBIGINT)"
    val zb = mul64(s"xor($za, $za >> 30)", c2)
    val zc = mul64(s"xor($zb, $zb >> 27)", c3)
    s"xor($zc, $zc >> 31)"
  }

  /** FNV-1a 64 over an ASCII string expression `t` as an ordered
    * list_reduce byte fold ([[graft.functions.SimHashImpl.fnv1a]]).
    * Returns UBIGINT. `unicode(t[i])` is the UTF-8 byte because the
    * corpus is ASCII (pinned by the multimodal byte oracles).
    */
  def fnvFold(t: String): String =
    s"""list_reduce(
       |      list_prepend(14695981039346656037::UBIGINT,
       |        list_transform(range(1, length($t)+1), i -> CAST(unicode($t[i]) AS UBIGINT))),
       |      (h, b) -> CAST((CAST(xor(h, b) AS HUGEINT) * 1099511628211) % $M64 AS UBIGINT))""".stripMargin

  /** Reinterpret a UBIGINT expression as signed 64-bit (HUGEINT result
    * in [-2^63, 2^63)) — for signed-Long min/compare parity.
    */
  def toSigned(u: String): String =
    s"(CAST($u AS HUGEINT) - CASE WHEN $u >= 9223372036854775808::UBIGINT " +
      s"THEN ${M64}::HUGEINT ELSE 0::HUGEINT END)"

  /** DuckDB rendering of [[graft.functions.Similarity.signBucket]]
    * (lists are 1-indexed in both engines' element_at semantics; float
    * sign is representation-exact, so bucket ids agree bit-for-bit).
    */
  def signBucket(bits: Int, vec: String = "embedding"): String =
    (0 until bits).map(b => s"(CASE WHEN $vec[${b + 1}] >= 0 THEN ${1L << b} ELSE 0 END)")
      .mkString("(", " + ", ")")
}
