package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LEARNED quality classifier — the model-based corpus filter stage of
  * a modern LM data pipeline (the DCLM / CCNet-fastText pattern): a
  * linear classifier over hashed bag-of-words features, trained by
  * DISTILLATION from the rule-based filter chain
  * ([[TextAnalysis.filterChain]]'s keep bit — the weak labels every
  * model-based quality gate bootstraps from), then applied corpus-wide
  * and audited against its teacher.
  *
  * Training is a FULL-BATCH perceptron for a FIXED number of rounds
  * with a HALVING integer step schedule: margin_d = Σ_b w[b]·x_db (x
  * is binary bucket presence plus an always-on bias bucket −1), a doc
  * is misclassified when y_d·margin_d ≤ 0, and round r's update is
  * w[b] += 2^(R−r) · Σ_misclassified y_d·x_db — the integer annealing
  * that stops the unit-step full-batch perceptron's two-state
  * oscillation on non-separable weak labels (measured: unit steps
  * cycle between all-keep and all-reject forever; the halving schedule
  * lands at a balanced separator). Everything is INTEGER and every
  * update is one commutative sum per bucket, so the result is
  * deterministic regardless of partitioning or accumulation order —
  * the Lloyd/BPE bounded-iteration doctrine applied to learning — and
  * the DuckDB oracle replays the whole optimization exactly, round by
  * round.
  *
  * Scale shape: the corpus-sized tables are the (doc_id, bucket)
  * feature pairs and the (doc_id, y) labels — compact longs, shuffled
  * a fixed `rounds`× few times. The model is a ≤ buckets+1-row table
  * that BROADCAST-joins into every margin computation; no weight state
  * ever shuffles with the corpus, and no driver collect exists
  * anywhere in the loop (the carried weight table crosses a
  * [[PlanBarrier.cut]] per round like every iterative operator here).
  */
object QualityClf {

  /** Hashed binary bag-of-words features: (doc_id, b) with one row per
    * distinct (doc, bucket) pair — bucket = portable-hash(token, seed)
    * mod buckets — plus the always-on bias bucket −1 for every doc. */
  def features(docs: DataFrame, buckets: Int = 256,
               seed: Long = 29L): DataFrame = {
    graft.functions.GraftHash64.register(docs.sparkSession)
    docs.select(col("doc_id"),
        explode(Dedup.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        pmod(call_function("graft_hash64", col("tok"), lit(seed)),
          lit(buckets.toLong)).as("b"))
      .distinct()
      .unionByName(docs.select(col("doc_id"), lit(-1L).as("b")))
  }

  /** Weak labels distilled from the rule-based gate: y ∈ {−1, +1}. */
  def labels(docs: DataFrame): DataFrame =
    TextAnalysis.filterChain(docs)
      .select(col("doc_id"), (col("keep") * 2 - 1).cast("long").as("y"))

  /** Fixed-round full-batch perceptron with the halving step schedule.
    * Returns (audit, weights): audit has one row per round — (rnd,
    * n_misclassified BEFORE the round's update, w_l1 and bias AFTER
    * it); weights is the final (b, w) table the score query applies. */
  def train(docs: DataFrame, rounds: Int = 8,
            buckets: Int = 256): (DataFrame, DataFrame) =
    trainOnFeatures(features(docs, buckets), labels(docs), rounds)

  /** [[train]] over ALREADY-EXTRACTED feature/label tables — the
    * store-fed entry point (the streaming funnel trains from its
    * per-doc (doc_id, b) feature store and (doc_id, y) labels without
    * re-reading text). `fx`/`lb` are materialized here; pass them raw. */
  def trainOnFeatures(fx0: DataFrame, lb0: DataFrame,
                      rounds: Int = 8): (DataFrame, DataFrame) = {
    val spark = fx0.sparkSession
    import spark.implicits._
    val fx = fx0.localCheckpoint(false)
    val lb = lb0.localCheckpoint(false)
    var w: DataFrame = Seq.empty[(Long, Long)].toDF("b", "w")
    var audit = Vector.empty[DataFrame]
    for (rnd <- 1 to rounds) {
      // margins under the PREVIOUS round's weights (round 1: all zero)
      val marg = fx.join(broadcast(w), Seq("b"), "left")
        .groupBy("doc_id")
        .agg(sum(coalesce(col("w"), lit(0L))).as("marg"))
      val mis = lb.join(marg, "doc_id")
        .filter(col("y") * col("marg") <= 0)
        .select("doc_id", "y")
        .localCheckpoint(false) // feeds the count AND the update
      val delta = fx.join(mis, "doc_id")
        .groupBy("b")
        .agg((sum("y") * lit(1L << (rounds - rnd))).as("d"))
      w = PlanBarrier.cut(
        w.join(delta, Seq("b"), "full_outer")
          .select(col("b"),
            (coalesce(col("w"), lit(0L)) + coalesce(col("d"), lit(0L)))
              .as("w")))
      val nm = mis.agg(count(lit(1)).as("n_misclassified"))
      val ws = w.agg(
        sum(when(col("b") >= 0, abs(col("w"))).otherwise(0L)).as("w_l1"),
        sum(when(col("b") === -1, col("w")).otherwise(0L)).as("bias"))
      audit :+= Scalars.withScalar(nm, col("n_misclassified"), ws, col("w_l1"))
        .select(lit(rnd.toLong).as("rnd"), col("n_misclassified"),
          coalesce(col("w_l1"), lit(0L)).as("w_l1"),
          coalesce(col("bias"), lit(0L)).as("bias"))
    }
    (audit.reduce(_ unionByName _).orderBy("rnd"), w)
  }

  /** Agreement matrix of the trained classifier against its rule-based
    * teacher: (rule_keep, clf_keep, n_docs) — the readout that says
    * whether the learned gate reproduces, tightens, or loosens the
    * rules before anyone swaps it into the filter funnel. */
  def scoreAgreement(docs: DataFrame, rounds: Int = 8,
                     buckets: Int = 256): DataFrame = {
    val (_, w) = train(docs, rounds, buckets)
    val fx = features(docs, buckets)
    val sc = fx.join(broadcast(w), Seq("b"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("w"), lit(0L))).as("marg"))
    labels(docs).join(sc, "doc_id")
      .select(
        when(col("y") === 1, 1L).otherwise(0L).as("rule_keep"),
        when(col("marg") > 0, 1L).otherwise(0L).as("clf_keep"))
      .groupBy("rule_keep", "clf_keep")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("rule_keep", "clf_keep")
  }
}
