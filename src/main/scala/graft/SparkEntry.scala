package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("m_simple_sum")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MetricQueries.queries ++ MetaQueries.queries ++ OlapQueries.queries ++
      PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    MetricQueries.oracle ++ MetaQueries.oracle ++ OlapQueries.oracle ++
      PipelineQueries.oracle

  /** Non-gated diagnostics (VERDICT r12 item 1): queries that probe the
    * DRIVER gate environment itself and are expected to hash-diverge
    * there by design (the `(div)/10^k.0` float-shape canaries). Run by
    * Bench every round and replayable locally via
    * `Verify --with-diagnostics` + tools/check_oracle.py (where they
    * pass), but excluded from the driver's hash-gated surface. */
  def diagnostics: Map[String, (SparkSession, String) => DataFrame] =
    OlapQueries.diagnostics

  /** Oracle SQL for [[diagnostics]] — local sweeps only. */
  def diagnosticsOracle: Map[String, String] = OlapQueries.diagnosticsOracle
}
