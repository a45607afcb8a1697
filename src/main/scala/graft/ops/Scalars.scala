package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attach a 1-row aggregate (a "scalar subquery" result) to every row
  * of a DataFrame WITHOUT a product join.
  *
  * `df.crossJoin(broadcast(scalar))` is semantically fine for a 1-row
  * build side, but it plans as BroadcastNestedLoopJoin — which in the
  * physical plan is indistinguishable from an accidental unbounded
  * product, so PlanSpec bans the operator for every non-exempt query
  * (the one standing exemption is ann_bruteforce's bounded broadcast
  * probe set). Joining on a degenerate equi-key instead keeps the
  * identical broadcast-1-row cost while planning as an auditable
  * BroadcastHashJoin.
  *
  * Because the BroadcastHashJoin shape also hides an accidental
  * multi-row build side from that audit, the 1-row contract is
  * enforced HERE at call time: global aggregates carry
  * `maxRows = Some(1)` through analysis, so legitimate callers pass
  * for free and anything else fails fast instead of silently
  * multiplying rows.
  *
  * BOTH keys must derive from real columns (hence `pmod(hash(col), 1)`
  * — always 0, but not constant-foldable: Catalyst folds all-literal
  * subtrees, and ConstantPropagation turns a literal key on EITHER
  * side into a pushed filter + condition-less join, degrading right
  * back to a nested loop). `hash` accepts any column type — string,
  * date, struct — where bare `pmod(col, 1)` would only analyze for
  * numerics; it also never returns null, so the key is total.
  *
  * `__sk` is a reserved intermediate name: inputs must not carry a
  * `__sk` column (enforced below).
  */
object Scalars {
  def withScalar(df: DataFrame, keyCol: Column,
                 scalar: DataFrame, scalarKeyCol: Column): DataFrame = {
    require(scalar.queryExecution.analyzed.maxRows.contains(1L),
      "withScalar needs a provably 1-row scalar (e.g. a global aggregate); " +
        s"got maxRows=${scalar.queryExecution.analyzed.maxRows}")
    require(!df.columns.contains("__sk") && !scalar.columns.contains("__sk"),
      "__sk is reserved by withScalar")
    def k(c: Column) = pmod(hash(c), lit(1))
    val left  = df.withColumn("__sk", k(keyCol))
    val right = scalar.withColumn("__sk", k(scalarKeyCol))
    left.join(broadcast(right), Seq("__sk")).drop("__sk")
  }
}
