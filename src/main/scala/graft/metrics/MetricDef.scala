package graft.metrics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Executable model of a dbt metric.
  *
  * Mirrors the reference's `DBTMetric` dataclass
  * (reference: dbt_metrics_to_datahub.py:54-72) — name, calculation
  * method, expression, filters, dimensions, time grains — but where the
  * reference only *catalogs* these fields as glossary metadata, graft
  * compiles them into Spark logical plans (see [[MetricCompiler]]).
  */
final case class MetricFilter(field: String, operator: String, value: String) {

  /** The filter as a native `Column` predicate (pushes down to the scan).
    *
    * dbt manifests carry filters as `{field, operator, value}` triples
    * (reference: dbt_metrics_to_datahub.py:64, test_manifest.json
    * avg_order_value.filters). Because manifest content is external input,
    * the operator is validated against an allowlist and the value is
    * parsed into a literal — never spliced into a SQL string.
    */
  def toColumn: Column = {
    if (!MetricFilter.FieldName.matches(field))
      throw new IllegalArgumentException(s"illegal filter field: $field")
    val c = col(field)
    val v = MetricFilter.literal(value)
    operator match {
      case "="  | "==" => c === v
      case "!=" | "<>" => c =!= v
      case "<"         => c < v
      case "<="        => c <= v
      case ">"         => c > v
      case ">="        => c >= v
      case op => throw new IllegalArgumentException(s"unsupported filter operator: $op")
    }
  }
}

object MetricFilter {
  private val FieldName = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Parse a dbt filter value into a typed literal: quoted → string,
    * true/false → boolean, otherwise numeric. Rejects anything else. */
  private[metrics] def literal(value: String): Column = {
    val t = value.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      lit(t.substring(1, t.length - 1))
    else if (t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false"))
      lit(t.toBoolean)
    else if (t.matches("[-+]?[0-9]+")) lit(t.toLong)
    else if (t.matches("[-+]?[0-9]*\\.[0-9]+([eE][-+]?[0-9]+)?")) lit(t.toDouble)
    else throw new IllegalArgumentException(s"unparseable filter value: $value")
  }
}

final case class MetricDef(
    name: String,
    /** count | count_distinct | sum | average | min | max | median |
      * median_approx | count_distinct_approx (reference:
      * test_manifest.json `calculation_method`; the `_approx` forms are
      * graft's sketch-based scale extensions — see
      * [[MetricCompiler.aggExpr]]). */
    calculationMethod: String,
    /** SQL expression over the base model's columns (the measure). */
    expression: String,
    /** event-time column used by time grains. */
    timestamp: Option[String] = None,
    filters: Seq[MetricFilter] = Nil,
    dimensions: Seq[String] = Nil,
    timeGrains: Seq[String] = Nil)
