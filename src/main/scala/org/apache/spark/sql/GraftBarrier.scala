package org.apache.spark.sql

/** Package-private Spark API bridge for [[graft.ops.PlanBarrier]].
  *
  * `Dataset.localCheckpoint` builds its result as
  * `LogicalRDD.fromDataset(...)`, which PRESERVES the source plan's
  * `originStats` and `originConstraints` across the checkpoint
  * boundary. In an iterative DataFrame loop (connected components,
  * PageRank, label propagation, k-core peel, BFS, power iteration)
  * whose body joins the loop-carried table — often with itself — the
  * size-only estimator multiplies the two sides' `sizeInBytes`
  * (SizeInBytesOnlyStatsPlanVisitor.visitJoin → default → product), so
  * the preserved estimate roughly SQUARES every round. The BigInt's
  * digit count then doubles per round and the driver ends up spending
  * whole seconds in BigInteger.multiply while "planning" a 9-node RDD
  * DAG: measured on the sf0.1 perceptual-hash component loop, plan
  * build went 0.4 s → 78 s between iterations 15 and 22 with stages,
  * tasks, and action time flat (jstack: all samples inside
  * BigInteger.multiplyToomCook3 under visitJoin).
  *
  * The fix is to rebuild the checkpoint as a FRESH leaf over the same
  * checkpointed InternalRow RDD, dropping the compounded
  * stats/constraints. That needs `internalCreateDataFrame`, which is
  * `private[sql]` — hence this one shim object inside the sql package.
  * Everything here is the public-bytecode surface of stock Apache
  * Spark; no behavior is patched.
  */
object GraftBarrier {

  /** Lazy local checkpoint of `df` whose resulting plan leaf carries
    * DEFAULT statistics (`spark.sql.defaultSizeInBytes`) instead of the
    * source plan's compounded estimate. Semantics otherwise identical
    * to `df.localCheckpoint(eager = false)`: the InternalRow RDD is
    * row-copied (UnsafeRow buffers are reused by the scan — caching
    * without copy corrupts), marked for local checkpoint, and cached at
    * first action. The huge default size also means the result never
    * auto-broadcasts statically — correct for loop iterates, and AQE
    * still converts small shuffle sides to broadcast at runtime.
    */
  def localCheckpointStatsReset(df: Dataset[Row]): DataFrame = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    cds.sparkSession.internalCreateDataFrame(rdd, cds.schema)
  }

  /** [[localCheckpointStatsReset]] that also reports the persisted
    * RDD's id — for long-lived SHARED artifacts (e.g. the suffix-rank
    * memo) that a block-manager sweep must be able to exempt and a
    * cache can liveness-check against `sc.getPersistentRDDs`. */
  def localCheckpointTracked(df: Dataset[Row]): (DataFrame, Int) = {
    val cds = df.asInstanceOf[classic.Dataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    (cds.sparkSession.internalCreateDataFrame(rdd, cds.schema), rdd.id)
  }
}
