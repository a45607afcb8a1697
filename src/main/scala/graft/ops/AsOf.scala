package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the most recent
  * right-side payload with the same key and `right.time <= left.time`.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union-sort trick rather than a range join:
  *
  *   1. union both sides into one keyed, time-ordered stream
  *      (right rows sort BEFORE left rows at equal timestamps —
  *      inclusive `<=` semantics, like DuckDB/pandas ASOF);
  *   2. one window per key fills the latest non-null payload forward;
  *   3. keep only left rows.
  *
  * Cost: ONE shuffle+sort on the key — the same work a dedicated
  * sort-merge as-of SparkPlan would do, with no O(|L|·|R|) range-join
  * blowup, so composition is preferred over a custom physical operator
  * (SURVEY §3 extension-preference order). Right side must be unique
  * per (key, time); pre-aggregate if it isn't.
  */
object AsOf {

  /** Working/output column names the union-sort trick claims for
    * itself. A caller frame already using one would be silently
    * clobbered or shadowed — fail loudly instead, the same convention
    * as Scalars.withScalar's __sk and Rank's __pid (r10 ADVICE). */
  private val Reserved = Set("_side", "_pl", "_plb", "_plf", "_rt",
    "_db", "_df", "_useB", "_best", "asof_delta", "asof_dir")

  private def requireFree(cols: Seq[String], what: String): Unit = {
    val clash = cols.filter(Reserved)
    require(clash.isEmpty,
      s"$what uses column name(s) reserved by AsOf: ${clash.mkString(", ")}")
  }

  /** Left-as-of join. `right` must contain `key`, `time`, and the
    * `payload` columns; the result is every `left` row plus the as-of
    * payload values (null where no right row precedes it). */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String]): DataFrame = {
    requireFree(left.columns.toSeq, "left frame")
    requireFree(payload, "payload")
    val rSchema = right.schema
    val lCols   = left.columns.toSeq

    // The payload travels as ONE struct so the forward fill picks every
    // payload column from the SAME (latest) right row. Filling each
    // column independently would let a NULL payload value resurrect a
    // staler value from an older right row — a result no single right
    // row ever contained, diverging from DuckDB/pandas ASOF semantics.
    val plType = org.apache.spark.sql.types.StructType(
      payload.map(p => rSchema(p)))
    val l = left.withColumn("_side", lit(1))
      .withColumn("_pl", lit(null).cast(plType))
    val r = lCols.filterNot(c => c == key || c == time)
      .foldLeft(right.select((Seq(key, time) ++ payload).map(col): _*)
        .withColumn("_side", lit(0))
        .withColumn("_pl", struct(payload.map(col): _*))) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    val ordered = Seq(key, time, "_side", "_pl") ++
      lCols.filterNot(c => c == key || c == time)
    val unioned = l.select(ordered.map(col): _*)
      .unionByName(r.select(ordered.map(col): _*))

    val w = Window.partitionBy(key)
      .orderBy(col(time), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("_pl", last(col("_pl"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select(lCols.map(col) ++ payload.map(p => col(s"_pl.$p").as(p)): _*)
  }

  /** NEAREST-direction as-of join: each left row picks the right row
    * (same key) with the smallest |right.time − left.time|, ties going
    * BACKWARD (the leakage-safe direction). The same union-sort trick
    * as [[joinAsOf]] — still exactly ONE shuffle+sort on the key —
    * with TWO window fills over the one sorted stream: a backward
    * `last(ignoreNulls)` and a forward `first(ignoreNulls)`; the right
    * row's own time rides inside the payload struct so the chooser
    * compares the two deltas without another join. At equal
    * timestamps the right row sorts before the left (inclusive
    * backward, delta 0 — which wins every tie by construction).
    * Right must be unique per (key, time); pre-aggregate if not.
    * Adds `asof_delta` (chosen |Δ|, left-time units, null when the key
    * has no right rows at all) and `asof_dir` ('b'/'f'/null). */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, key: String,
                      time: String, payload: Seq[String]): DataFrame = {
    requireFree(left.columns.toSeq, "left frame")
    requireFree(payload, "payload")
    val lCols = left.columns.toSeq
    val plCols = payload :+ "_rt"
    val r0 = right.select((Seq(key, time) ++ payload).map(col): _*)
      .withColumn("_rt", col(time))
    val plStruct = struct(plCols.map(col): _*)
    val plType = r0.select(plStruct.as("_pl")).schema("_pl").dataType
    val l = left.withColumn("_side", lit(1))
      .withColumn("_pl", lit(null).cast(plType))
    val r = lCols.filterNot(c => c == key || c == time)
      .foldLeft(r0.withColumn("_side", lit(0)).withColumn("_pl", plStruct)) {
        (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val ordered = Seq(key, time, "_side", "_pl") ++
      lCols.filterNot(c => c == key || c == time)
    val unioned = l.select(ordered.map(col): _*)
      .unionByName(r.select(ordered.map(col): _*))
    val ord = Window.partitionBy(key).orderBy(col(time), col("_side"))
    val wb = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wf = ord.rowsBetween(0, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("_plb", last(col("_pl"), ignoreNulls = true).over(wb))
      .withColumn("_plf", first(col("_pl"), ignoreNulls = true).over(wf))
      .filter(col("_side") === 1)
      .withColumn("_db", col(time) - col("_plb._rt"))
      .withColumn("_df", col("_plf._rt") - col(time))
      .withColumn("_useB",
        col("_plb").isNotNull && (col("_plf").isNull || col("_db") <= col("_df")))
      .withColumn("_best", when(col("_useB"), col("_plb")).otherwise(col("_plf")))
    filled.select(lCols.map(col) ++
      payload.map(p => col(s"_best.$p").as(p)) ++ Seq(
        when(col("_best").isNotNull,
          when(col("_useB"), col("_db")).otherwise(col("_df"))).as("asof_delta"),
        when(col("_best").isNotNull,
          when(col("_useB"), lit("b")).otherwise(lit("f"))).as("asof_dir")): _*)
  }
}
