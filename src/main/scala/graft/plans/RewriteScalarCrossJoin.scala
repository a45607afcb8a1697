package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.MapType

/** Optimizer rule: a condition-less inner/cross join whose build side
  * is PROVABLY one row (`maxRows == 1`, e.g. a global aggregate — the
  * "attach a scalar to every row" pattern) is rewritten to an
  * equi-join on a degenerate derived key.
  *
  * Why: the raw form plans as BroadcastNestedLoopJoin, which in the
  * physical plan is indistinguishable from an accidental unbounded
  * product — so plan audits (PlanSpec) must either ban it and force
  * every caller through [[graft.ops.Scalars.withScalar]], or exempt
  * the query and lose the audit. This rule closes the gap at the
  * OPTIMIZER level: user code may write the natural
  * `df.crossJoin(scalarAgg)` and still get an auditable
  * BroadcastHashJoin, because the rewritten join condition
  * `pmod(hash(l.col), 1) = pmod(hash(r.col), 1)` (always 0 = 0, never
  * null) extracts as equi-join keys.
  *
  * Semantics are unchanged: against a 1-row side, an always-true
  * equi-join emits exactly the cross product's rows; a 0-row side
  * yields empty either way. Sides whose first hashable column doesn't
  * exist (pure-map outputs) are left alone.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`; the derived keys are built from real
  * attributes (not literals) so constant folding cannot collapse the
  * condition back into a nested loop.
  */
object RewriteScalarCrossJoin extends Rule[LogicalPlan] {

  // Murmur3Hash rejects MapType anywhere in the type tree (map
  // hashing is order-undefined), so the guard must be recursive —
  // a struct/array nesting a map would pass a top-level check but
  // fail at execution when the hash is injected post-analysis.
  // (DataType.existsRecursively is private[sql], hence the local walk.)
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: MapType => true
    case a: org.apache.spark.sql.types.ArrayType => containsMap(a.elementType)
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => containsMap(f.dataType))
    case _ => false
  }

  private def hashable(p: LogicalPlan) =
    p.output.find(a => !containsMap(a.dataType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Join(l, r, jt, None, hint)
        if (jt == Cross || jt == Inner) && r.maxRows.contains(1L) &&
          hashable(l).isDefined && hashable(r).isDefined =>
      val cond = EqualTo(
        Pmod(new Murmur3Hash(Seq(hashable(l).get)), Literal(1)),
        Pmod(new Murmur3Hash(Seq(hashable(r).get)), Literal(1)))
      Join(l, r, Inner, Some(cond), hint)
  }
}
