package graft.functions

/** Numeric helpers for JVM kernels that must be bit-identical to
  * Spark SQL / DuckDB expression semantics (oracle hash-parity). */
object Num extends Serializable {

  /** round(x, scale) exactly as Spark's Round and DuckDB round():
    * decimal HALF_UP on the double's shortest decimal representation.
    * (math.rint rounds half-to-even — a silent oracle mismatch.) */
  def roundHalfUp(x: Double, scale: Int): Double =
    // Spark's Round returns NaN/Infinity unchanged; BigDecimal throws
    if (!java.lang.Double.isFinite(x)) x
    else BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** round(x, 0) HALF_UP on the fast path (no BigDecimal): .5
    * fractions round away from zero, matching [[roundHalfUp]]. */
  def round0(x: Double): Double = {
    val f = math.floor(x)
    val d = x - f
    if (d > 0.5) f + 1 else if (d < 0.5) f else if (x >= 0) f + 1 else f
  }

  /** Distinct character 3-grams, replicating the SQL form
    * `transform(sequence(1, greatest(length(text)-2, 1)), i ->
    * substring(text, i, 3))`: texts shorter than 3 chars yield the
    * text itself as the single gram. Indices are CODE POINTS, as in
    * Spark/DuckDB substring/length — Java char (UTF-16 unit) offsets
    * would split surrogate pairs and diverge on non-BMP text. */
  def gramSet(text: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val cps = text.codePointCount(0, text.length)
    val n = math.max(cps - 2, 1)
    var i = 0
    var charStart = 0 // char offset of code point i
    while (i < n) {
      val charEnd = text.offsetByCodePoints(charStart,
        math.min(3, cps - i))
      out.add(text.substring(charStart, charEnd))
      i += 1
      if (i < n) charStart = text.offsetByCodePoints(charStart, 1)
    }
    out
  }
}
