package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-label centroid distance audits over an embedding column — the
  * "find the vectors that don't belong to their cluster" pass a
  * curation pipeline runs to catch mislabeled or corrupted embeddings
  * before they poison retrieval training.
  *
  * Scale shape: the vectors explode to (vec_id, label, pos, v) — N×dim
  * rows, but each row is 28 bytes, not a text blob — and make exactly
  * two key-partitioned passes:
  *
  *   1. `groupBy(label, pos)` builds the centroid matrix — its result
  *      is labels×dim rows (BOUNDED: label cardinality is small by
  *      construction), so the join back is an explicit `broadcast`;
  *   2. `groupBy(vec_id)` folds the three cosine sums per vector — one
  *      shuffle of the exploded table.
  *
  * The alternative (a TypedImperativeAggregate summing whole arrays)
  * saves the explode but loses whole-stage codegen; the relational
  * path keeps every operator inside codegen and lets AQE size the
  * exploded shuffle.
  *
  * The outlier rank runs on the ROUNDED cosine (4 dp) so
  * mathematically-tied vectors rank identically in any engine — same
  * contract as Corpus.tfidfTop.
  */
object Embeddings {

  /** The k most centroid-distant vectors per label:
    * (label, vec_id, cos, rnk) — low cosine = far from own centroid. */
  def centroidOutliers(emb: DataFrame, k: Int = 3): DataFrame = {
    val ex = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val cent = ex.groupBy("label", "pos").agg(avg("v").as("c"))
    val sums = ex.join(broadcast(cent), Seq("label", "pos"))
      .groupBy("vec_id", "label")
      .agg(sum(col("v") * col("c")).as("vc"),
        sum(col("v") * col("v")).as("vv"),
        sum(col("c") * col("c")).as("cc"))
    val scored = sums.select(col("label"), col("vec_id"),
      round(col("vc") / (sqrt(col("vv")) * sqrt(col("cc"))), 4).as("cos"))
    // NULLS LAST explicitly: a zero-norm vector/centroid yields a NULL
    // cos, and Spark's default ASC puts NULLs FIRST (= top outliers)
    // while SQL oracles default to NULLS LAST — pin the contract so a
    // degenerate vector can never flip the ranking between engines.
    val w = Window.partitionBy("label")
      .orderBy(asc_nulls_last("cos"), col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
  }
}
