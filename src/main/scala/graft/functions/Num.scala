package graft.functions

/** Numeric helpers for JVM kernels that must be bit-identical to
  * Spark SQL / DuckDB expression semantics (oracle hash-parity). */
object Num extends Serializable {

  /** round(x, scale) exactly as Spark's Round and DuckDB round():
    * decimal HALF_UP on the double's shortest decimal representation.
    * (math.rint rounds half-to-even — a silent oracle mismatch.) */
  def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

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
    * text itself as the single gram. */
  def gramSet(text: String): java.util.HashSet[String] = {
    val out = new java.util.HashSet[String]()
    val n = math.max(text.length - 2, 1)
    var i = 0
    while (i < n) {
      out.add(text.substring(i, math.min(i + 3, text.length)))
      i += 1
    }
    out
  }
}
