package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge: apply a batch of updates to
  * a versioned snapshot by CLOSING each updated key's open row at the
  * update's effective time and APPENDING the new version as the open
  * row — the standard CDC-upsert shape for append-only data lakes
  * (no in-place mutation; history is preserved as [valid_from,
  * valid_to) intervals).
  *
  * Scale shape: ONE equi-join on the key (current and updates
  * co-shuffle; AQE broadcasts a small update batch at runtime) plus a
  * union — never a window over the whole snapshot. `updates` must
  * carry the same payload columns as `current` plus the new
  * `valid_from`, and at most one update per key per batch
  * (pre-aggregate to the latest otherwise, as with [[AsOf]]).
  */
object Scd2 {

  /** Merge one update batch into a versioned snapshot.
    *
    * `current`: key, payload…, `validFrom`, `validTo` (null = open).
    * `updates`: key, payload…, `validFrom` (the effective time).
    * Result: closed prior versions + untouched rows + new open rows. */
  def merge(current: DataFrame, updates: DataFrame, key: String,
            validFrom: String = "valid_from",
            validTo: String = "valid_to"): DataFrame = {
    val toType = current.schema(validTo).dataType
    val eff = updates.select(col(key), col(validFrom).as("_eff"))
    val closed = current.join(eff, Seq(key), "left")
      .withColumn(validTo,
        // only the OPEN row of an updated key closes; already-closed
        // history keeps its interval
        when(col(validTo).isNull, col("_eff").cast(toType))
          .otherwise(col(validTo)))
      .drop("_eff")
    closed.unionByName(
      updates.withColumn(validTo, lit(null).cast(toType))
        .select(closed.columns.map(col): _*))
  }
}
