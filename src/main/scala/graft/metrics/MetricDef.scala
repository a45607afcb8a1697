package graft.metrics

/** Executable model of a dbt metric.
  *
  * Mirrors the reference's `DBTMetric` dataclass
  * (reference: dbt_metrics_to_datahub.py:54-72) — name, calculation
  * method, expression, filters, dimensions, time grains — but where the
  * reference only *catalogs* these fields as glossary metadata, graft
  * compiles them into Spark logical plans (see [[MetricCompiler]]).
  */
final case class MetricFilter(field: String, operator: String, value: String) {
  /** dbt filters are SQL snippets `field op value`; keep them that way so
    * Catalyst parses them into native predicates that push down to the scan. */
  def sql: String = s"($field) $operator ($value)"
}

final case class MetricDef(
    name: String,
    /** count | count_distinct | sum | average | min | max | median
      * (reference: test_manifest.json `calculation_method`). */
    calculationMethod: String,
    /** SQL expression over the base model's columns (the measure). */
    expression: String,
    /** event-time column used by time grains. */
    timestamp: Option[String] = None,
    filters: Seq[MetricFilter] = Nil,
    dimensions: Seq[String] = Nil,
    timeGrains: Seq[String] = Nil)
