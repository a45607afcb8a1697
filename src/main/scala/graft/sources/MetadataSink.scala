package graft.sources

import org.apache.spark.sql.DataFrame

/** Emission endpoint for metadata records (glossary nodes/terms, lineage).
  *
  * The reference emits each record to a REST endpoint one MCP at a time,
  * with a dry-run mode that only logs (reference:
  * dbt_metrics_to_datahub.py:100-117). Spark-first, the emission is a
  * batch sink: the records DataFrame is written once (parquet or json),
  * so a million-term glossary is one distributed write, not a driver
  * loop of HTTP calls. Dry-run validates the plan and counts records
  * without writing anything.
  */
object MetadataSink {

  final case class EmitResult(records: Long, path: Option[String])

  /** Write `records` to `path` as `format` ("parquet" | "json");
    * `dryRun=true` validates + counts without writing. */
  def emit(records: DataFrame, path: String, format: String = "parquet",
           dryRun: Boolean = false): EmitResult = {
    require(Set("parquet", "json")(format), s"unsupported sink format: $format")
    if (dryRun) EmitResult(records.count(), None)
    else {
      records.write.mode("overwrite").format(format).save(path)
      EmitResult(records.sparkSession.read.format(format).load(path).count(), Some(path))
    }
  }
}
