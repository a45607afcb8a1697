package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** From-scratch deterministic HyperLogLog, expressed as plain
  * DataFrame aggregation — no opaque sketch buffer, no UDAF.
  *
  * The sketch STATE is a (group, bucket) → max(rho) table: bucket is
  * the top P bits of the engine-portable [[graft.functions.GraftHash64]]
  * of the key, rho the 1-based leading-zero count of the remaining
  * bits. That state is mergeable by construction (max is associative/
  * commutative), so rolling day sketches up to months is a groupBy-max
  * — the pre-aggregation pattern exact count_distinct can never use —
  * and every step is a portable relational operation an independent
  * engine can replay: this is what lets the DuckDB oracle hash-match
  * an HLL ESTIMATE, which an engine-specific binary sketch
  * (approx_count_distinct / datasketches) never could.
  *
  * Estimator: standard HLL (Flajolet et al. 2007) with the
  * linear-counting small-range correction. P=12 → m=4096 buckets,
  * ~1.6% typical error; the max-rho state is exact-deterministic, and
  * the float work (harmonic mean + ln) only happens on m-sized
  * aggregates.
  */
object HllSketch {

  val P = 12
  val M: Int = 1 << P
  /** Standard alpha_m for m >= 128. */
  val Alpha: Double = 0.7213 / (1 + 1.079 / M)

  /** Leading-zero rank of the post-shift hash bits: w = hash << P holds
    * the remaining 64-P bits at the top; rho = position of the highest
    * set bit from the MSB (1-based), 64-P+1 when w == 0. A literal
    * unsigned-compare CASE chain — exact, codegen-friendly, and
    * replayable verbatim in the oracle SQL (a float log2 would be
    * off-by-one at power-of-two boundaries after double rounding). */
  private def rho(w: Column): Column = {
    var c = when(w < 0, 1) // top bit set (signed view) -> rho 1
    for (r <- 2 to 64 - P) c = c.when(w >= (1L << (64 - r)), r)
    c.otherwise(64 - P + 1) // w == 0
  }

  /** Per-row (bucket, rho) columns for a key (hashed via its string
    * rendering, so any key type works and the oracle can re-derive).
    * Build sketch STATE by grouping on (grain cols, bucket) with
    * max(rho); merge state to a coarser grain by re-grouping with
    * max(rho) again. */
  def bucketRho(spark: org.apache.spark.sql.SparkSession, key: Column): (Column, Column) = {
    graft.functions.GraftHash64.register(spark)
    val h = call_function("graft_hash64", key.cast("string"), lit(0L))
    (shiftrightunsigned(h, 64 - P).as("bucket"), rho(shiftleft(h, P)).as("rho"))
  }

  /** HLL estimate from sketch state, one row per group. */
  def estimate(state: DataFrame, groupCols: Seq[String]): DataFrame = {
    val agg = state.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("nz"), sum(pow(lit(0.5), col("rho"))).as("sp"))
    agg.select(groupCols.map(col) :+ {
      val raw   = lit(Alpha) * M * M / (col("sp") + (lit(M) - col("nz")))
      val zeros = lit(M) - col("nz")
      round(when(raw <= 2.5 * M && zeros > 0, lit(M.toDouble) * log(lit(M.toDouble) / zeros))
        .otherwise(raw)).cast("long").as("est")
    }: _*)
  }
}
