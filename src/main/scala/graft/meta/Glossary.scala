package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Glossary hierarchy (root → category → term) as DataFrame transforms.
  *
  * Re-expresses the reference's `create_glossary_hierarchy` and
  * `emit_metric_as_glossary_term` (reference:
  * dbt_metrics_to_datahub.py:172-216, :256-335): nested categories like
  * `Finance/Revenue` become dot-joined URN paths, the term URN is
  * `<root>.<category path>.<metric name>`, and every metric field the
  * reference flattens into GlossaryTermInfo customProperties (dbt ids,
  * calc method, dims/grains/filters/tags, `meta_*` passthrough,
  * upstream dataset URNs) becomes an entry of a map column here.
  */
object Glossary {

  val DefaultRoot = "dbt_metrics"

  private def nodeUrn(name: Column): Column = concat(lit("urn:li:glossaryNode:"), name)
  private def termUrn(name: Column): Column = concat(lit("urn:li:glossaryTerm:"), name)

  private def category: Column =
    coalesce(element_at(col("meta"), "datahub_glossary_category"), lit("Uncategorized"))

  /** All glossary records (root node + category nodes + term per metric)
    * with columns: entity_type, urn, name, definition, parent_urn,
    * custom_properties. `lineage` is [[Lineage.resolve]] output, used to
    * fill the `upstream_datasets` property. */
  def records(metrics: DataFrame, lineage: DataFrame, root: String = DefaultRoot): DataFrame = {
    val spark = metrics.sparkSession
    import spark.implicits._

    val rootDf = Seq((
      "glossaryNode", s"urn:li:glossaryNode:$root", root,
      "dbt metrics ingested from dbt project"))
      .toDF("entity_type", "urn", "name", "definition")
      .withColumn("parent_urn", lit(null).cast("string"))
      .withColumn("custom_properties", lit(null).cast("map<string,string>"))

    val cats = metrics.select(category.as("cat")).distinct()
      .select(
        lit("glossaryNode").as("entity_type"),
        nodeUrn(concat(lit(s"$root."), regexp_replace(col("cat"), "/", "."))).as("urn"),
        element_at(split(col("cat"), "/"), -1).as("name"),
        concat(lit("Metrics in category: "), col("cat")).as("definition"),
        lit(s"urn:li:glossaryNode:$root").as("parent_urn"),
        lit(null).cast("map<string,string>").as("custom_properties"))

    // upstream dataset URNs per metric, in depends_on order
    val upstream = lineage
      .filter(col("dataset_urn").isNotNull)
      .groupBy(col("metric_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("dep_pos"), col("dataset_urn")))),
        s => s.getField("dataset_urn")), ", ").as("upstream_datasets"))

    val withUp = metrics.join(broadcast(upstream),
      metrics("unique_id") === upstream("metric_id"), "left")

    // reference custom-properties flattening (:269-304); null/empty
    // entries are dropped, matching the reference's conditional adds
    val fixedProps: Column = map_filter(
      map(
        lit("dbt_unique_id"), col("unique_id"),
        lit("dbt_package"), col("package_name"),
        lit("dbt_path"), col("path"),
        lit("metric_type"), col("type"),
        lit("calculation_method"), col("calculation_method"),
        lit("expression"), col("expression"),
        lit("dimensions"), array_join(coalesce(col("dimensions"), array()), ", "),
        lit("time_grains"), array_join(coalesce(col("time_grains"), array()), ", "),
        lit("filters"), when(size(col("filters")) > 0, to_json(col("filters"))),
        lit("tags"), array_join(coalesce(col("tags"), array()), ", "),
        lit("upstream_datasets"), col("upstream_datasets")),
      (_, v) => v.isNotNull && v =!= "")

    val metaProps: Column = transform_keys(
      map_filter(coalesce(col("meta"), map()), (k, _) => k =!= "datahub_glossary_category"),
      (k, _) => concat(lit("meta_"), k))

    // reference GlossaryTermInfo: name=label||name, definition=
    // description||fallback (empty string also falls back, like
    // Python's `or`), termSource="dbt" (:310-316)
    val catPath = regexp_replace(category, "/", ".")
    val terms = withUp.select(
      lit("glossaryTerm").as("entity_type"),
      termUrn(concat_ws(".", lit(root), catPath, col("name"))).as("urn"),
      when(col("label").isNotNull && col("label") =!= "", col("label"))
        .otherwise(col("name")).as("name"),
      when(col("description").isNotNull && col("description") =!= "", col("description"))
        .otherwise(concat(lit("dbt metric: "), col("name"))).as("definition"),
      nodeUrn(concat(lit(s"$root."), catPath)).as("parent_urn"),
      map_concat(fixedProps, metaProps).as("custom_properties"),
      lit("dbt").as("term_source"))

    rootDf.withColumn("term_source", lit(null).cast("string"))
      .unionByName(cats.withColumn("term_source", lit(null).cast("string")))
      .unionByName(terms)
  }
}
