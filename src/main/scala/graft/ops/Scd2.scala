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

  /** SCD2 well-formedness audit — the invariant checker every consumer
    * of a versioned store implicitly assumes and nobody runs: per key
    * the [from, to) intervals must be non-empty, non-overlapping and
    * contiguous, with EXACTLY ONE open row (valid_to = the far-future
    * sentinel; a null valid_to is NOT open under this convention — it
    * surfaces as a missing open row, loudly). A violation means the
    * merge cadence double-applied or dropped a batch; temporal joins
    * silently pick arbitrary versions on such a store, which is why
    * this audit gates them.
    *
    * Scale shape: one key-partitioned window (lead over the version
    * order) + two aggregations — exactly the SCD2 read-path shuffle,
    * nothing quadratic. Output 1 row: n_keys, n_versions,
    * n_bad_interval (from ≥ to), n_overlaps (next from < this to),
    * n_gaps (next from > this to), n_keys_multi_open, n_keys_no_open,
    * ok = 1 iff every count is zero. */
  def audit(dim: DataFrame, key: String, validFrom: String = "valid_from",
            validTo: String = "valid_to",
            openSentinel: String = "9999-12-31"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy("vf", "vt")
    val sent = lit(openSentinel).cast(dim.schema(validTo).dataType)
    val r = dim.select(col(key).as("k"), col(validFrom).as("vf"),
        col(validTo).as("vt"))
      .withColumn("nvf", lead("vf", 1).over(w))
      // a NULL valid_to must fire counters, not null them out: every
      // flag coalesces to false so the open-row census still sees the
      // row (a null-vt row is simply "not open" — and a key holding
      // only such rows lands in n_keys_no_open, loudly)
      .select(col("k"),
        coalesce(col("vf") >= col("vt"), lit(false)).cast("long").as("bad"),
        coalesce(col("nvf").isNotNull && col("nvf") < col("vt"), lit(false))
          .cast("long").as("ovl"),
        coalesce(col("nvf").isNotNull && col("nvf") > col("vt"), lit(false))
          .cast("long").as("gap"),
        coalesce(col("vt") === sent, lit(false)).cast("long").as("opn"))
    r.groupBy("k")
      .agg(count(lit(1)).as("nv"), sum("bad").as("bad"), sum("ovl").as("ovl"),
        sum("gap").as("gap"), sum("opn").as("opn"))
      .agg(count(lit(1)).as("n_keys"), sum("nv").as("n_versions"),
        sum("bad").as("n_bad_interval"), sum("ovl").as("n_overlaps"),
        sum("gap").as("n_gaps"),
        sum((col("opn") > 1).cast("long")).as("n_keys_multi_open"),
        sum((col("opn") === 0).cast("long")).as("n_keys_no_open"))
      .withColumn("ok", (col("n_bad_interval") + col("n_overlaps")
        + col("n_gaps") + col("n_keys_multi_open")
        + col("n_keys_no_open") === 0).cast("long"))
  }
}
