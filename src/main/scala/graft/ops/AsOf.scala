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

  /** Left-as-of join. `right` must contain `key`, `time`, and the
    * `payload` columns; the result is every `left` row plus the as-of
    * payload values (null where no right row precedes it). */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String, time: String,
               payload: Seq[String]): DataFrame = {
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
}
