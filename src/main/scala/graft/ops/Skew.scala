package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salt-and-explode equi-join.
  *
  * A shuffle join on a hot key puts every row of that key in ONE
  * reducer task; at 100 TB a single hot customer/session key can hold
  * a stage hostage. AQE's skew-join splitting handles sort-merge
  * spills, but when the skew is known (or measured), salting removes
  * the hot partition altogether:
  *
  *  - the LARGE side gets a deterministic salt in [0, buckets) per row
  *    (hash of the whole row's join context — here a second column —
  *    NOT `rand()`: deterministic plans are replayable and testable);
  *  - the SMALL-PER-KEY side is exploded `buckets`× so every salted
  *    partition finds its match;
  *  - the join key becomes (key, salt), fanning each hot key across
  *    `buckets` reducers.
  *
  * Result set is IDENTICAL to the unsalted join (the salted query is
  * SQL-oracled against the plain join to prove it).
  */
object Skew {

  /** `large ⋈ small ON large(key) = small(key)`, with the large side's
    * hot keys fanned across `buckets` reducers. `saltBy` must be a
    * deterministic per-row expression on the large side (e.g. another
    * column); the small side is replicated `buckets`×. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int = 8, saltBy: Column): DataFrame = {
    val saltedLarge = large.withColumn("_salt", pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
