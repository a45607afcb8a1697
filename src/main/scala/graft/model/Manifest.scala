package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** dbt `manifest.json` → DataFrames.
  *
  * Re-expresses the reference's `load_manifest` / `parse_metrics` /
  * `parse_semantic_models` (reference: dbt_metrics_to_datahub.py:119-170)
  * as Spark transformations: the manifest is parsed with `from_json`
  * using `MapType` schemas (manifest sections are JSON objects keyed by
  * unique_id), then each section's map explodes into one row per entity.
  *
  * Driver-side work is O(1): only the raw JSON string moves through the
  * session; all shaping happens in the plan, so a multi-thousand-node
  * manifest costs the same code path as the test fixture.
  */
object Manifest {

  private val filterType = ArrayType(StructType(Seq(
    StructField("field", StringType), StructField("operator", StringType),
    StructField("value", StringType))))

  private val metricType = StructType(Seq(
    StructField("name", StringType),
    StructField("label", StringType),
    StructField("description", StringType),
    StructField("type", StringType),
    StructField("calculation_method", StringType),
    StructField("expression", StringType),
    StructField("timestamp", StringType),
    StructField("time_grains", ArrayType(StringType)),
    StructField("dimensions", ArrayType(StringType)),
    StructField("filters", filterType),
    StructField("meta", MapType(StringType, StringType)),
    StructField("tags", ArrayType(StringType)),
    StructField("package_name", StringType),
    StructField("path", StringType),
    StructField("depends_on", StructType(Seq(StructField("nodes", ArrayType(StringType))))),
  ))

  private val nodeType = StructType(Seq(
    StructField("database", StringType), StructField("schema", StringType),
    StructField("name", StringType), StructField("alias", StringType),
    StructField("resource_type", StringType), StructField("package_name", StringType),
    StructField("depends_on", StructType(Seq(StructField("nodes", ArrayType(StringType))))),
  ))

  private val sourceType = StructType(Seq(
    StructField("database", StringType), StructField("schema", StringType),
    StructField("name", StringType), StructField("identifier", StringType),
    StructField("resource_type", StringType), StructField("source_name", StringType),
  ))

  private val semanticModelType = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("model", StringType),
    StructField("dimensions", ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("type", StringType))))),
    StructField("measures", ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("agg", StringType))))),
    StructField("entities", ArrayType(StructType(Seq(
      StructField("name", StringType), StructField("type", StringType))))),
  ))

  private val manifestType = StructType(Seq(
    StructField("metrics", MapType(StringType, metricType)),
    StructField("nodes", MapType(StringType, nodeType)),
    StructField("sources", MapType(StringType, sourceType)),
    StructField("semantic_models", MapType(StringType, semanticModelType)),
  ))

  /** One-row DataFrame holding the parsed manifest struct. */
  def parse(spark: SparkSession, manifestJson: String): DataFrame = {
    import spark.implicits._
    Seq(manifestJson).toDF("raw")
      .select(from_json(col("raw"), manifestType).as("m"))
  }

  /** The built-in test fixture (same logical content the reference's own
    * test manifest exercises: 3 metrics, 2 models, 2 sources). */
  def fixtureJson: String = {
    val in = getClass.getResourceAsStream("/graft/fixture_manifest.json")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  private def section(parsed: DataFrame, field: String): DataFrame =
    parsed.select(explode(col(s"m.$field")).as(Seq("unique_id", "e")))
      .select(col("unique_id"), col("e.*"))

  /** metrics section → one row per metric (reference parse_metrics :125-150). */
  def metrics(parsed: DataFrame): DataFrame = section(parsed, "metrics")

  /** nodes (models) section → one row per node. */
  def nodes(parsed: DataFrame): DataFrame = section(parsed, "nodes")

  /** sources section → one row per source. */
  def sources(parsed: DataFrame): DataFrame = section(parsed, "sources")

  /** semantic_models section (reference parse_semantic_models :152-170). */
  def semanticModels(parsed: DataFrame): DataFrame = section(parsed, "semantic_models")

  /** Manifest metrics as executable [[graft.metrics.MetricDef]]s — the
    * bridge the reference never crosses: it only catalogs these fields
    * (dbt_metrics_to_datahub.py:125-150); graft compiles them to plans
    * via [[graft.metrics.MetricCompiler]]. Driver-side collect is
    * metadata-sized (one row per metric definition, not per data row). */
  def toMetricDefs(metricsDf: DataFrame): Seq[graft.metrics.MetricDef] = {
    import graft.metrics.{MetricDef, MetricFilter}
    metricsDf.select("name", "calculation_method", "expression", "timestamp",
        "filters", "dimensions", "time_grains")
      .collect().toSeq.map { r =>
        val filters = Option(r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("filters"))
          .getOrElse(Nil).map(f => MetricFilter(
            f.getAs[String]("field"), f.getAs[String]("operator"), f.getAs[String]("value")))
        def strs(col: String): Seq[String] =
          Option(r.getAs[scala.collection.Seq[String]](col)).map(_.toSeq).getOrElse(Nil)
        MetricDef(
          name = r.getAs[String]("name"),
          calculationMethod = r.getAs[String]("calculation_method"),
          expression = r.getAs[String]("expression"),
          timestamp = Option(r.getAs[String]("timestamp")),
          filters = filters.toSeq,
          dimensions = strs("dimensions"),
          timeGrains = strs("time_grains"))
      }
  }
}
