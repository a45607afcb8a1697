package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Manifest
import graft.meta.{Glossary, Lineage}

/** §2 items 13-15: the reference's own manifest → glossary → lineage
  * pipeline, as DataFrame transforms over the built-in fixture manifest
  * (same logical content as the reference's test manifest: 3 metrics,
  * 2 models, 2 sources, nested `Finance/Revenue`-style categories).
  *
  * These are rows-only checked by the driver (no SQL oracle — the
  * results are metadata records, not table aggregates); ManifestSpec
  * asserts the exact URNs/properties the reference would emit.
  */
object MetaQueries {

  private def parsed(s: SparkSession): DataFrame = Manifest.parse(s, Manifest.fixtureJson)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // reference parse_metrics (:125-150): the metrics catalog
    "meta_parse_metrics" -> ((s, _) => {
      Manifest.metrics(parsed(s)).select(
        col("unique_id"), col("name"), col("label"),
        col("calculation_method"), col("expression"),
        col("timestamp").as("timestamp_col"),
        array_join(coalesce(col("time_grains"), array()), ", ").as("time_grains"),
        array_join(coalesce(col("dimensions"), array()), ", ").as("dimensions"),
        coalesce(element_at(col("meta"), "datahub_glossary_category"),
          lit("Uncategorized")).as("category"),
        array_join(coalesce(col("tags"), array()), ", ").as("tags"),
        col("package_name"), col("path"),
        size(coalesce(col("filters"), array())).as("n_filters"),
        array_join(coalesce(col("depends_on.nodes"), array()), ", ").as("depends_on"))
        .orderBy("unique_id")
    }),

    // reference create_glossary_hierarchy + emit_metric_as_glossary_term
    "meta_glossary" -> ((s, _) => {
      val p = parsed(s)
      val lin = Lineage.resolve(Manifest.metrics(p), Manifest.nodes(p), Manifest.sources(p))
      Glossary.records(Manifest.metrics(p), lin)
        .withColumn("custom_properties", to_json(col("custom_properties")))
        .orderBy("entity_type", "urn")
    }),

    // reference resolve_node_to_dataset_urn over every metric dep
    "meta_lineage" -> ((s, _) => {
      val p = parsed(s)
      Lineage.resolve(Manifest.metrics(p), Manifest.nodes(p), Manifest.sources(p))
        .orderBy("metric_id", "dep_pos")
    }),
  )
}
