package graft.queries

/** DuckDB-SQL builders for unsigned-64-bit arithmetic, used by the
  * oracle strings that replicate the engine's JVM hash kernels
  * ([[graft.functions.Fnv64]], [[graft.functions.MinHash.splitmix64]],
  * [[graft.functions.Winnow]]) bit-for-bit in portable SQL.
  *
  * Representation: a u64 value is a `HUGEINT` in [0, 2^64). Multiplies
  * split the left operand at 2^32 so no intermediate exceeds 2^97
  * (HUGEINT holds ±2^127). XOR round-trips through the signed BIGINT
  * bit pattern (DuckDB `xor` is 64-bit two's complement, same as the
  * JVM's `^`).
  *
  * IMPORTANT: DuckDB inlines lateral column aliases by textual
  * substitution, so chaining these helpers through aliases in one
  * SELECT explodes exponentially. [[nest]] materializes each step as
  * its own subquery projection instead — evaluation stays linear.
  */
private[queries] object OracleSql {

  val M = "18446744073709551616::HUGEINT" // 2^64
  private val H = "9223372036854775808::HUGEINT" // 2^63

  /** u64 → signed BIGINT bit pattern. */
  def sb(a: String): String =
    s"CAST(CASE WHEN ($a) >= $H THEN ($a) - $M ELSE ($a) END AS BIGINT)"

  /** signed BIGINT bit pattern → u64. */
  def ub(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M ELSE CAST(($x) AS HUGEINT) END)"

  def uxor(a: String, b: String): String = ub(s"xor(${sb(a)}, ${sb(b)})")

  def ushr(a: String, n: Int): String = s"(($a) // ${1L << n}::HUGEINT)"

  /** (a * b) mod 2^64 for a, b in [0, 2^64). */
  def umul(a: String, b: String): String =
    s"(((((($a) // 4294967296::HUGEINT) * ($b)) % $M) * 4294967296::HUGEINT" +
      s" + (($a) % 4294967296::HUGEINT) * ($b)) % $M)"

  def uadd(a: String, b: String): String = s"((($a) + ($b)) % $M)"

  /** Wrap `base` in one subquery per step, each projecting `expr AS
    * alias` (computed once — see the inlining note above). */
  def nest(base: String, steps: Seq[(String, String)]): String =
    steps.foldLeft(base) { case (q, (expr, alias)) =>
      s"SELECT *, $expr AS $alias FROM ($q)"
    }

  /** [[graft.functions.FixedLog.log2Fixed]]'s integer shift-and-square
    * steps UNROLLED over `base` (a SELECT yielding HUGEINT columns
    * `num` and `den` plus any carry-through columns): 7 binary
    * normalization steps + FracBits squaring/digit steps, every op the
    * Scala kernel's twin in HUGEINT. The result SELECT carries the
    * base's columns plus `e7`/`f20`; [[log2ResultExpr]] folds them to
    * the lattice value. Shared by the DSIR-weights and text-entropy
    * oracles so the chain cannot drift per consumer (round 18). */
  def log2ChainSql(base: String): String = {
    def p2(n: Int): String = (BigInt(1) << n).toString
    val normSteps = Seq(64, 32, 16, 8, 4, 2, 1).zipWithIndex.flatMap {
      case (sft, i) =>
        val c = s"x$i >= ${p2(30 + sft)}::HUGEINT"
        Seq(
          s"CASE WHEN $c THEN x$i // ${p2(sft)}::HUGEINT ELSE x$i END" -> s"x${i + 1}",
          s"CASE WHEN $c THEN e$i + $sft ELSE e$i END" -> s"e${i + 1}")
    }
    val sqSteps = (0 until graft.functions.FixedLog.FracBits).flatMap { j =>
      Seq(
        s"(m$j * m$j) // ${p2(30)}::HUGEINT" -> s"t$j",
        s"CASE WHEN t$j >= ${p2(31)}::HUGEINT THEN t$j // 2 ELSE t$j END" -> s"m${j + 1}",
        s"f$j * 2 + CASE WHEN t$j >= ${p2(31)}::HUGEINT THEN 1 ELSE 0 END" -> s"f${j + 1}")
    }
    nest(base,
      Seq(s"((num * ${p2(60)}::HUGEINT) // den) * ${p2(20)}::HUGEINT" -> "x0",
        // exponent bias −50: x ≈ v·2^80, mantissa keeps 2^30
        "CAST(-50 AS BIGINT)" -> "e0") ++
        normSteps ++ Seq("x7" -> "m0", "0::HUGEINT" -> "f0") ++ sqSteps)
  }

  /** The lattice value e·2^FracBits + frac of a [[log2ChainSql]] row. */
  def log2ResultExpr: String =
    s"CAST(e7 * ${graft.functions.FixedLog.FracUnit} + " +
      s"f${graft.functions.FixedLog.FracBits} AS BIGINT)"

  /** splitmix64 as nest() steps: input column expr → output alias. */
  def splitmixSteps(in: String, out: String): Seq[(String, String)] = {
    val t = s"_$out"
    Seq(
      uadd(in, "11400714819323198485::HUGEINT") -> s"${t}z0",
      uxor(s"${t}z0", ushr(s"${t}z0", 30)) -> s"${t}x0",
      umul(s"${t}x0", "13787848793156543929::HUGEINT") -> s"${t}z1",
      uxor(s"${t}z1", ushr(s"${t}z1", 27)) -> s"${t}x1",
      umul(s"${t}x1", "10723151780598845931::HUGEINT") -> s"${t}z2",
      uxor(s"${t}z2", ushr(s"${t}z2", 31)) -> out)
  }

  val FnvOffset = "14695981039346656037::HUGEINT"

  /** One FNV-1a fold step ((acc ^ b) * prime mod 2^64) — small enough
    * to inline inside a list_reduce lambda. */
  def fnvStep(acc: String, b: String): String =
    umul(uxor(acc, b), "1099511628211::HUGEINT")

  /** FNV-1a over a HUGEINT list expression. */
  def fnvList(lst: String): String =
    s"list_reduce(list_prepend($FnvOffset, $lst), (acc, b) -> ${fnvStep("acc", "b")})"

  /** FNV-1a of a string expression's bytes (ASCII corpus: ord(char) =
    * byte; the empty-char filter makes FNV('') = offset basis, matching
    * the JVM's zero-byte fold). */
  def fnvString(s: String): String =
    fnvList(s"list_transform(list_filter(string_split($s, ''), c -> c <> ''), c -> ord(c)::HUGEINT)")

  /** `unnest` literal array of 2^b for b = 0..63 (HUGEINT — DuckDB has
    * no u64 shift; a literal table sidesteps it). */
  val Pow2: String =
    (0 until 64).map(b => java.lang.Long.toUnsignedString(1L << b))
      .mkString("[", ",", "]::HUGEINT[]")

  /** CTE body computing `sim(doc_id, simhash)` — the SQL twin of
    * [[graft.functions.MinHash.simhash64]] over the documents table. */
  val simhashCte: String = s"""
toks AS (SELECT doc_id, t.token AS token
         FROM documents, unnest(string_split(text, ' ')) AS t(token)),
th AS (SELECT doc_id, ${fnvString("token")} AS h FROM toks),
bitrows AS (SELECT unnest(range(0,64)) AS bit, unnest($Pow2) AS p),
votes AS (
  SELECT th.doc_id, b.bit, b.p,
         sum(CASE WHEN (th.h // b.p) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN bitrows b GROUP BY 1, 2, 3),
sim AS (
  SELECT doc_id, ${sb("sum(CASE WHEN v > 0 THEN p ELSE 0::HUGEINT END)")} AS simhash
  FROM votes GROUP BY doc_id)"""
}
