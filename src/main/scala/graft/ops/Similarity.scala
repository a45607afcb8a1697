package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over
  * `embeddings(vec_id, embedding: array<float>, label)`.
  *
  * Two paths, per SURVEY §4:
  *  - brute force: exact cosine top-k, valid ONLY when the probe set is
  *    broadcast-able (it is joined with an explicit `broadcast()`, so
  *    the corpus is scanned once with no shuffle of the big side);
  *  - LSH: random-hyperplane signatures bucket both sides; probes and
  *    corpus co-shuffle on the bucket id, so each bucket's candidate
  *    set is tiny compared with the corpus. The scale path — recall is
  *    tunable via planes/probes-per-bucket.
  */
object Similarity {

  /** Exact cosine top-k for each probe (probe set must be small —
    * broadcast). Per-vector norms are precomputed, so each
    * probe×corpus cell costs one array fold.
    * Output: probe_id, rank, neighbor_id, cos (4dp). */
  def bruteForceTopK(emb: DataFrame, probeFilter: Column, k: Int = 5): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Dedup.dot(col("v"), col("v"))))
    val probes = e.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val cos = Dedup.dot(col("pv"), col("v")) / (col("pn") * col("nrm"))
    val w   = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"))
  }

  /** Deterministic random hyperplanes: `planes(seed)(p)(d)`. */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(planes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature of `v` against the hyperplanes, as an int bucket id. */
  def bucketOf(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit): _*)
      when(Dedup.dot(v, plane) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** IVF (inverted-file) ANN: the corpus is coarse-quantized into
    * `cells` Voronoi cells (deterministic pseudo-random seeds + one
    * Lloyd refinement step, both distributed; only the k×dim centroid
    * matrix ever reaches the driver), each vector is assigned to its
    * nearest centroid, and a probe searches only its `nprobe` nearest
    * cells — the corpus side of the search join is an equi-join on
    * cell id, so a probe touches ~nprobe/cells of the data.
    * Output: probe_id, rank, neighbor_id, cos (4dp), cell. */
  def ivfTopK(emb: DataFrame, probeFilter: Column, k: Int = 5,
              cells: Int = 16, nprobe: Int = 4): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Dedup.dot(col("v"), col("v"))))

    // deterministic pseudo-random seed sample (multiplicative-hash
    // ordered — engine-neutral, so the DuckDB oracle re-derives the
    // same seeds), then one Lloyd step: assign → per-cell elementwise
    // mean via posexplode. The mean is quantized to 6dp so the refined
    // centroids are identical across engines regardless of float
    // summation order (fixed-point centroids — no quality impact at
    // this precision, deterministic assignment everywhere).
    val seeds = centroidRows(
      e.orderBy(pmod(col("vec_id") * lit(2654435761L), lit(1000003L)), col("vec_id"))
        .limit(cells).select(col("v")).collect().map(_.getSeq[Double](0).toArray))
    val seeded  = e.withColumn("cell", nearestCell(col("v"), col("nrm"), seeds))
    val refined = centroidRows(
      seeded.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(round(avg("x"), 6).as("m"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("c"))
        .orderBy("cell")
        .collect().map(_.getSeq[Double](1).toArray))

    val corpus = e.withColumn("cell", nearestCell(col("v"), col("nrm"), refined))
    val probes = corpus.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"),
        explode(nearestCells(col("v"), col("nrm"), refined, nprobe)).as("cell"))
    val cos = Dedup.dot(col("pv"), col("v")) / (col("pn") * col("nrm"))
    val w   = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    corpus.join(probes, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("cell"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("cell"))
  }

  private final case class Centroid(vec: Array[Double], norm: Double)

  private def centroidRows(vs: Array[Array[Double]]): Array[Centroid] =
    vs.map(v => Centroid(v, math.sqrt(v.map(x => x * x).sum)))

  /** Similarity of `v` to each centroid, as (sim, idx) structs. */
  private def centroidSims(v: Column, nrm: Column, cs: Array[Centroid]): Column =
    array(cs.zipWithIndex.map { case (c, i) =>
      val cv  = array(c.vec.map(lit): _*)
      val sim = Dedup.dot(v, cv) / (nrm * lit(c.norm))
      struct(sim.as("sim"), lit(i).as("idx"))
    }: _*)

  /** Index of the nearest centroid (max cosine; struct compare breaks
    * float ties by the higher idx — deterministic either way). */
  private def nearestCell(v: Column, nrm: Column, cs: Array[Centroid]): Column =
    array_max(centroidSims(v, nrm, cs)).getField("idx")

  /** Indices of the `nprobe` nearest centroids. */
  private def nearestCells(v: Column, nrm: Column, cs: Array[Centroid], nprobe: Int): Column =
    transform(slice(reverse(array_sort(centroidSims(v, nrm, cs))), 1, nprobe),
      s => s.getField("idx"))

  /** LSH-bucketed ANN: probes and corpus are hashed to hyperplane
    * sign buckets and equi-joined on the bucket id; top-k is computed
    * inside the bucket. Output: probe_id, rank, neighbor_id, cos (4dp),
    * bucket. Neighbors in other buckets are missed — that is the
    * approximation; recall grows as `numPlanes` shrinks. */
  def lshTopK(emb: DataFrame, probeFilter: Column, k: Int = 5,
              numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    graft.functions.DotProduct.register(emb.sparkSession)
    val dim    = 64
    val planes = hyperplanes(numPlanes, dim, seed)
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", bucketOf(col("v"), planes))
      .withColumn("nrm", sqrt(Dedup.dot(col("v"), col("v"))))
    val probes = e.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"), col("bucket"))
    val cos = Dedup.dot(col("pv"), col("v")) / (col("pn") * col("nrm"))
    val w   = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    e.join(probes, Seq("bucket"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), col("bucket"), cos.as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"), col("bucket"))
  }
}
