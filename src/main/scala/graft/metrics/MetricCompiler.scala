package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Compiles [[MetricDef]]s into Spark DataFrame plans.
  *
  * The reference script classifies metrics as simple / ratio / derived /
  * cumulative (reference: dbt_metrics_to_datahub.py:61,
  * example_dbt_metrics.yml) but never executes them; here each type
  * becomes a declarative Spark plan so Catalyst gets full visibility:
  *
  *  - one metric = ONE shuffle (groupBy grain+dims with map-side partial
  *    aggregation); filters are `Column` predicates that push down into
  *    the parquet scan;
  *  - ratio/derived metrics over the same base model are fused into a
  *    single aggregation pass (conditional aggregates), not N passes;
  *  - cumulative metrics pre-aggregate to the grain FIRST and run the
  *    running/rolling window over the tiny aggregated table — the window
  *    never sees raw rows, so the plan survives a 100 TB fact table.
  */
object MetricCompiler {

  /** Period column for a grain: DATE for day+ grains, TIMESTAMP below day. */
  def periodCol(timestamp: String, grain: String): Column = {
    val t = date_trunc(grain, col(timestamp))
    grain.toLowerCase match {
      case "hour" | "minute" | "second" => t
      case _                            => t.cast("date")
    }
  }

  /** Aggregate expression for a calculation method, optionally gated by a
    * predicate (used to fuse differently-filtered metrics in one pass). */
  def aggExpr(calc: String, expression: String, gate: Option[Column] = None): Column = {
    val e    = expr(expression)
    val base = gate.map(g => when(g, e)).getOrElse(e)
    calc.toLowerCase match {
      case "count"          => count(base)
      case "count_distinct" => count_distinct(base)
      case "sum"            => sum(base)
      case "average"        => avg(base)
      case "min"            => min(base)
      case "max"            => max(base)
      case "median"         => median(base)
      case other            => throw new IllegalArgumentException(s"unknown calculation_method: $other")
    }
  }

  private def applyFilters(base: DataFrame, filters: Seq[MetricFilter]): DataFrame =
    filters.foldLeft(base)((df, f) => df.filter(expr(f.sql)))

  private def groupKeys(m: MetricDef, grain: Option[String]): Seq[Column] =
    grain.map(g => periodCol(m.timestamp.getOrElse(
      throw new IllegalArgumentException(s"metric ${m.name} has a grain but no timestamp")), g).as("period")).toSeq ++
      m.dimensions.map(col)

  /** `simple` metric: filters → groupBy(period, dims) → agg. */
  def simple(base: DataFrame, m: MetricDef, grain: Option[String]): DataFrame = {
    val filtered = applyFilters(base, m.filters)
    val agg      = aggExpr(m.calculationMethod, m.expression).as(m.name)
    val keys     = groupKeys(m, grain)
    if (keys.isEmpty) filtered.agg(agg) else filtered.groupBy(keys: _*).agg(agg)
  }

  /** Several metrics over the same base model fused into one aggregation
    * pass. Per-metric filters become conditional aggregates, so N metrics
    * still cost one scan + one shuffle. Grain/dims come from `shape`. */
  def fused(base: DataFrame, shape: MetricDef, metrics: Seq[MetricDef], grain: Option[String]): DataFrame = {
    val aggs = metrics.map { m =>
      val gate = m.filters.map(f => expr(f.sql)).reduceOption(_ && _)
      aggExpr(m.calculationMethod, m.expression, gate).as(m.name)
    }
    val keys = groupKeys(shape, grain)
    if (keys.isEmpty) base.agg(aggs.head, aggs.tail: _*)
    else base.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `ratio` metric: numerator metric / denominator metric, null-safe
    * (fused into a single pass — reference example_dbt_metrics.yml:26-41). */
  def ratio(base: DataFrame, name: String, numerator: MetricDef, denominator: MetricDef,
            grain: Option[String]): DataFrame =
    fused(base, numerator, Seq(numerator, denominator), grain)
      .withColumn(name, col(numerator.name) / nullif(col(denominator.name), lit(0)))

  /** `derived` metric: a SQL expression over already-aggregated measure
    * columns (reference metric type `derived`/`expression`). */
  def derived(base: DataFrame, name: String, expression: String,
              measures: Seq[MetricDef], grain: Option[String]): DataFrame =
    fused(base, measures.head, measures, grain).withColumn(name, expr(expression))

  /** `cumulative` metric: running (or trailing-N-period) aggregate of a
    * simple metric over its grain (reference example_dbt_metrics.yml:77-92).
    * Pre-aggregates to the grain, then windows over the aggregated rows.
    * `trailing=None` → running total since the beginning. */
  def cumulative(base: DataFrame, m: MetricDef, grain: String,
                 trailing: Option[Int] = None, cumName: Option[String] = None,
                 cumAgg: String = "sum"): DataFrame = {
    val perPeriod = simple(base, m, Some(grain))
    val w0 = if (m.dimensions.isEmpty) Window.orderBy(col("period"))
             else Window.partitionBy(m.dimensions.map(col): _*).orderBy(col("period"))
    val w = trailing match {
      case Some(n) => w0.rowsBetween(-(n - 1L), Window.currentRow)
      case None    => w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val cum = cumAgg.toLowerCase match {
      case "sum" => sum(col(m.name)).over(w)
      case "avg" | "average" => avg(col(m.name)).over(w)
      case other => throw new IllegalArgumentException(s"unknown cumulative agg: $other")
    }
    perPeriod.withColumn(cumName.getOrElse(s"cumulative_${m.name}"), cum)
  }

  /** One metric evaluated at several grains, unioned with a `grain` label
    * column (reference `time_grains` list — test_manifest.json metrics
    * declare day/week/month/quarter/year). */
  def multiGrain(base: DataFrame, m: MetricDef, grains: Seq[String]): DataFrame =
    grains.map { g =>
      simple(base, m, Some(g)).select(
        lit(g).as("grain") +: col("period") +: (m.dimensions.map(col) :+ col(m.name)): _*)
    }.reduce(_ unionByName _)
}
