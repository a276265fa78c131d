package graft.functions

/** Deterministic fixed-point base-2 logarithm of a positive rational —
  * the cross-engine-exact log the ln-free doctrine otherwise forbids
  * (README: libm `ln` is the one sub-expression with no bit contract).
  *
  * `log2Fixed(num, den)` ≈ log2(num/den) on the 2^-20 lattice, computed
  * ENTIRELY in integer arithmetic (classic shift-and-square digit
  * extraction), so a SQL oracle running the identical integer steps
  * over HUGEINT reproduces every output bit-for-bit by construction —
  * no floating-point transcendental on either side. Used by the DSIR
  * importance weights (`pipe_dsir_weights`, PipelineOps), whose oracle
  * unrolls these exact steps as a nest() chain.
  *
  * Algorithm (all shifts/divides truncating):
  *   1. r = num·2^60 / den  (≈ v·2^60), then x = r·2^20 ≈ v·2^80;
  *   2. binary down-normalization (shifts 64,32,16,8,4,2,1): after the
  *      step of size s, x < 2^(30+s); termination puts x in
  *      [2^30, 2^31) with e = total shift − 50 = the integer part
  *      (x carries v·2^80, the mantissa keeps 2^30);
  *   3. 20 squaring steps on the 31-bit mantissa extract one
  *      fractional bit each: m ← m²/2^30 ∈ [2^30, 2^32); m ≥ 2^31
  *      emits 1 and halves, else emits 0;
  *   4. result = e·2^20 + frac  (frac ∈ [0, 2^20)).
  *
  * Properties (FixedLogSpec): monotone NON-DECREASING in num/den
  * (floor-truncation never inverts order), exact on powers of two, and
  * within ~2^-19 of the true log2 across the domain — the error is a
  * DEFINED deterministic function of the inputs, which is what
  * cross-engine parity needs; analytic exactness is not the contract.
  *
  * Domain: v = num/den must satisfy r ≥ 2^10 and r < 2^107, i.e.
  * |log2 v| ≲ 47 — far wider than any smoothed count ratio (bounded by
  * the corpus token total). Outside it the kernel throws rather than
  * normalize incorrectly. */
object FixedLog {

  val FracBits = 20
  val FracUnit: Long = 1L << FracBits

  def log2Fixed(num: BigInt, den: BigInt): Long = {
    require(num > 0 && den > 0, s"log2Fixed domain: $num / $den")
    val r = (num << 60) / den
    require(r >= (BigInt(1) << 10) && r < (BigInt(1) << 107),
      s"log2Fixed range: num/den = $num/$den outside [2^-50, 2^47)")
    // x ≈ v·2^80; the mantissa keeps 2^30, so the exponent bias is
    // 80 − 30 = 50: e = (total shift) − 50
    var x = r << FracBits // in [2^30, 2^127)
    var e = -50L
    var sft = 64
    while (sft >= 1) {
      if (x >= (BigInt(1) << (30 + sft))) { x >>= sft; e += sft }
      sft >>= 1
    }
    // x ∈ [2^30, 2^31): Long-safe from here (m² < 2^62)
    var m = x.toLong
    var frac = 0L
    var i = 0
    while (i < FracBits) {
      m = (m * m) >> 30
      frac <<= 1
      if (m >= (1L << 31)) { m >>= 1; frac |= 1L }
      i += 1
    }
    e * FracUnit + frac
  }
}
