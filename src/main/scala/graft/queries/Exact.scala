package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** §5-doctrine integer-unit money arithmetic (SURVEY.md §5).
  *
  * `round(sum(x), 2)` diverges between engines exactly when the true sum
  * can land on a 0.005 boundary — which happens STRUCTURALLY when x is a
  * product of 2dp-quantized columns (price·(1−disc) is an exact multiple
  * of 1e-4; ~1% of group sums end in ...50 1e-4-units, i.e. exactly on
  * the 2dp boundary, where each engine's accumulation order decides the
  * direction). The fix: accumulate in exact integer base units (cents,
  * 1e-4, 1e-6) and convert with half-up INTEGER division, so no float
  * ever enters an accumulator.
  *
  * Accumulators are DECIMAL(38,0), not LongType: a 1e-6-unit row reaches
  * ~1e11, so a long sum overflows near 1e8 rows per group — real at
  * 100 TB. Spark sums decimals exactly; the DuckDB oracle mirrors by
  * summing BIGINT into HUGEINT.
  *
  * The conversions use floor((2s+d)/(2d)) on decimals with SMALL CONSTANT
  * divisors only (200 / 20000): Spark's decimal division keeps ≥6
  * fractional digits and the true quotient has ≤5, so the division is
  * exact and floor is the true integral half-up quotient. Ratios of two
  * SUMS (big, non-constant divisors) must NOT use this shape — decimal
  * division scale-trim rounds before floor; those sites use the exact
  * `div` (IntegralDivide) via expr() on named sum columns instead.
  */
object Exact {

  /** 2dp-quantized double → exact integer cents (long). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Per-row price·(1−disc) in 1e-4 dollar units. */
  def rev4(price: Column, disc: Column): Column =
    (cents(price) * (lit(100L) - cents(disc))).cast("decimal(38,0)")

  /** Per-row price·(1−disc)·(1+tax) in 1e-6 dollar units. */
  def rev6(price: Column, disc: Column, tax: Column): Column =
    (cents(price) * (lit(100L) - cents(disc)) * (lit(100L) + cents(tax)))
      .cast("decimal(38,0)")

  /** Per-row a·b of two 2dp-quantized columns in 1e-4 dollar units. */
  def prod4(a: Column, b: Column): Column =
    (cents(a) * cents(b)).cast("decimal(38,0)")

  /** Half-away-from-zero s/d for a small constant divisor d (matches
    * round()'s HALF_UP on the same value; sign-split so engine
    * truncation conventions can't differ on negatives). */
  private def halfUp(s: Column, d: Int): Column = {
    val q = floor((abs(s) * 2 + d) / (2 * d)).cast("long")
    when(s < 0, -q).otherwise(q)
  }

  /** 1e-4-unit integer sum → half-up 2dp dollars (double). */
  def u4Dollars(s: Column): Column = halfUp(s, 100) / 100.0

  /** 1e-6-unit integer sum → half-up 2dp dollars (double). */
  def u6Dollars(s: Column): Column = halfUp(s, 10000) / 100.0

  /** Cent-unit integer sum → exact dollars (double). */
  def centsDollars(s: Column): Column = s.cast("double") / 100.0

  // ---- DuckDB oracle fragments (the SQL mirror of the above) ----

  /** price cents as BIGINT (DuckDB sums BIGINT into HUGEINT). */
  val pcSql = "CAST(round(l_extendedprice*100) AS BIGINT)"
  /** (1−disc)·100 as BIGINT. */
  val dmSql = "(100 - CAST(round(l_discount*100) AS BIGINT))"
  /** (1+tax)·100 as BIGINT. */
  val tpSql = "(100 + CAST(round(l_tax*100) AS BIGINT))"
  /** Σ price·(1−disc) in 1e-4 units. */
  val sum4Sql = s"sum($pcSql*$dmSql)"
  /** Σ price·(1−disc)·(1+tax) in 1e-6 units. */
  val sum6Sql = s"sum($pcSql*$dmSql*$tpSql)"
  /** half-up 1e-4-unit sum → 2dp dollars (positive sums only). */
  def u4DollarsSql(s: String) = s"((2*$s + 100) // 200) / 100.0"
  /** half-up 1e-6-unit sum → 2dp dollars (positive sums only). */
  def u6DollarsSql(s: String) = s"((2*$s + 10000) // 20000) / 100.0"
  /** signed half-away-from-zero variant for sums that can go negative. */
  def u4DollarsSignedSql(s: String) =
    s"(CASE WHEN $s < 0 THEN -((2*(-($s)) + 100) // 200) ELSE ((2*$s + 100) // 200) END) / 100.0"
}
