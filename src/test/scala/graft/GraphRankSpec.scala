package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Embeddings, Graph, Rank}
import graft.sources.Tables

class GraphRankSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("triangleStats: 4-clique has C(4,3) triangles and clustering 1; path and star have none") {
    def stats(edges: Seq[(Long, Long)]) =
      Graph.triangleStats(edges.toDF("a", "b")).head()
    // K4: 6 edges, 4 triangles, wedges Σ 3·2/2 = 12, clustering 3·4/12 = 1
    val k4 = stats(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
    assert(k4.getAs[Long]("n_nodes") == 4 && k4.getAs[Long]("n_edges") == 6)
    assert(k4.getAs[Long]("n_wedges") == 12 && k4.getAs[Long]("n_triangles") == 4)
    assert(math.abs(k4.getAs[Double]("clustering") - 1.0) < 1e-9)
    // path 1-2-3-4: 2 wedges, no triangle
    val path = stats(Seq((1L,2L),(2L,3L),(3L,4L)))
    assert(path.getAs[Long]("n_triangles") == 0 && path.getAs[Long]("n_wedges") == 2)
    // star (hub 1): all wedges at the hub, no triangle — the shape the
    // degree orientation must not explode on
    val star = stats(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L)))
    assert(star.getAs[Long]("n_triangles") == 0 && star.getAs[Long]("n_wedges") == 6)
    assert(star.getAs[Double]("clustering") == 0.0)
    // triangle + pendant: exactly one triangle survives the orientation
    val tp = stats(Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L)))
    assert(tp.getAs[Long]("n_triangles") == 1)
  }

  test("pagerank on a 3-node path puts the center on top and conserves mass") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val r = Graph.pagerank(pairs, damping = 0.85, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L))
    // symmetric path graph: ends are exchangeable, center dominates
    assert(math.abs(r(1L) - r(3L)) < 1e-12)
    assert(r(2L) > r(1L))
    // with no dangling nodes total mass is conserved at 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // hand-computed iteration 1 for the center: 0.05 + 0.85*(1/3 + 1/3)
    val r1 = Graph.pagerank(pairs, damping = 0.85, iters = 1)
      .filter(col("id") === 2L).head().getDouble(1)
    assert(math.abs(r1 - (0.15 / 3 + 0.85 * (1.0 / 3 + 1.0 / 3))) < 1e-12)
  }

  test("globalRank equals the single-window row_number at any block width") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("n_chars"))
    val expected = docs
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("bigint"))
      .select("doc_id", "rnk")
    for (bw <- Seq(1L, 64L, 1000000000L)) {
      val got = Rank.globalRank(docs, "n_chars", "doc_id", blockWidth = bw)
        .select("doc_id", "rnk")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"blockWidth=$bw diverges from the reference ranking")
    }
  }

  test("runningMax equals the single-window running max at any block width") {
    // gaps in the order column: blocks need not be dense or equal-size
    val e = Tables.events(spark, sf)
      .select(col("event_id"), expr("ts_ns div 1000").as("ts_us"))
      .filter(col("event_id") % 3 =!= 1)
    val expected = e
      .withColumn("run_max", max("ts_us").over(
        org.apache.spark.sql.expressions.Window.orderBy("event_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select("event_id", "run_max")
    for (bw <- Seq(1L, 7L, 4096L, 1000000000L)) {
      val got = graft.ops.Rank.runningMax(e, "event_id", "ts_us", bw)
        .select("event_id", "run_max")
      assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
        s"blockWidth=$bw diverges from the reference running max")
    }
  }

  test("globalRank refuses a reserved __blk column") {
    val bad = Tables.documents(spark, sf).withColumn("__blk", lit(1))
    intercept[IllegalArgumentException] {
      Rank.globalRank(bad, "n_chars", "doc_id")
    }
  }

  test("globalRank handles an all-equal value column (single block, tie order)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), lit(7L).as("v"))
    val got = Rank.globalRank(docs, "v", "doc_id")
      .orderBy("rnk").collect().map(r => r.getAs[Long]("doc_id"))
    // all values tie → rank order must be pure tie-break (doc_id asc)
    assert(got.sameElements(got.sorted))
    assert(got.length == docs.count())
  }

  test("globalRank + byRange match row_number on adversarial distributions") {
    import org.apache.spark.sql.expressions.Window
    // three shapes a fixed-width blocker hates: all-equal (one block),
    // 2-value 99/1 skew, and hash-like values spanning the long range
    val n = 2000
    val shapes = Map(
      "all_equal" -> Seq.tabulate(n)(i => (i.toLong, 7L)),
      "two_value_skew" -> Seq.tabulate(n)(i => (i.toLong, if (i % 100 == 0) 1L else 0L)),
      "full_range_hash" -> Seq.tabulate(n)(i =>
        (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))) // spreads over ±2^63
    for ((label, data) <- shapes) {
      val df = data.toDF("id", "v").repartition(8)
      val expected = df.withColumn("rnk", row_number().over(
          Window.orderBy(col("v").desc, col("id").asc)).cast("bigint"))
        .select("id", "rnk")
      for ((name, got) <- Seq(
          "fixed" -> Rank.globalRank(df, "v", "id", blockWidth = 10000.0),
          "range" -> Rank.globalRankByRange(df, "v", "id", numBlocks = 8))) {
        val g = got.select("id", "rnk")
        assert(g.exceptAll(expected).isEmpty && expected.exceptAll(g).isEmpty,
          s"$name/$label diverges from the row_number reference")
      }
    }
  }

  test("globalRankByRange keeps blocks balanced where fixed width cannot") {
    // the all-equal edge: fixed-width puts ALL n rows in one block (a
    // single-task sort at scale — the documented globalRank caveat);
    // sampled range bounds split on the tie column and stay ~n/blocks
    val n = 4000
    val df = Seq.tabulate(n)(i => (i.toLong, 7L)).toDF("id", "v").repartition(8)
    val blocks = 8
    val sizes = df.repartitionByRange(blocks, col("v").desc, col("id").asc)
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getAs[Long]("count"))
    assert(sizes.max <= 2L * n / blocks,
      s"range blocks unbalanced on all-equal values: ${sizes.toSeq}")
    // and the fixed-width blocker really does degenerate here — the
    // contrast that motivates the variant
    val fixedBlocks = df.select(floor(col("v") / lit(64.0)).cast("long").as("b"))
      .distinct().count()
    assert(fixedBlocks == 1)
  }

  test("bottom-k hash sample is mergeable: bottom-k(A ∪ B) == bottom-k(bk(A) ∪ bk(B))") {
    graft.functions.GraftHash64.register(spark)
    val k = 20
    val hashed = Tables.documents(spark, sf).select(col("doc_id"),
      call_function("graft_hash64", col("doc_id").cast("string"), lit(13L)).as("h"))
    def bk(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("h").asc, col("doc_id")).limit(k)
    val a = hashed.filter(col("doc_id") % 2 === 0)
    val b = hashed.filter(col("doc_id") % 2 =!= 0)
    val direct = bk(hashed).collect().map(_.getLong(0)).toSeq
    val merged = bk(bk(a).unionByName(bk(b))).collect().map(_.getLong(0)).toSeq
    assert(direct == merged)
  }

  test("power-iteration direction is unit-norm and captures more variance than uniform") {
    val emb = Tables.embeddings(spark, sf)
    val v = graft.ops.Pca.topDirection(emb, iters = 3)
    val comps = v.collect().map(r => r.getAs[Int]("pos") -> r.getAs[Double]("v")).toMap
    assert(comps.size == 64)
    assert(math.abs(comps.values.map(x => x * x).sum - 1.0) < 1e-9)
    // Rayleigh quotient along the learned direction must beat the
    // uniform init direction it started from (it converges toward the
    // top eigenvector, whose quotient is maximal)
    def rayleigh(dir: Map[Int, Double]): Double = {
      val rows = emb.select("embedding").collect()
        .map(_.getAs[scala.collection.Seq[Float]](0))
      rows.map { e =>
        val dot = e.iterator.zipWithIndex.map { case (x, i) => x * dir(i) }.sum
        dot * dot
      }.sum
    }
    val uniform = (0 until 64).map(i => i -> 1.0 / 8.0).toMap
    assert(rayleigh(comps) > rayleigh(uniform))
  }

  test("kCorePeel strips a pendant chain but keeps the clique; curve matches a replay") {
    // K4 plus node 5 attached to 4/6/7 (initial degree 3, but two of
    // those neighbors are leaves): the 3-core is exactly the K4, and
    // the peel takes TWO rounds — leaves 6,7 fall first, which only
    // then drops 5's degree below 3.
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(5L,7L)).toDF("a", "b")
    val rows = Graph.kCorePeel(edges, k = 3, rounds = 4)
      .orderBy("round").collect()
    assert(rows.map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"),
      r.getAs[Long]("n_edges"), r.getAs[Long]("stable"))).toSeq == Seq(
      (0L, 7L, 9L, 0L),  // full graph
      (1L, 5L, 7L, 0L),  // leaves 6,7 dropped; 5 survives on deg 3
      (2L, 4L, 6L, 0L),  // 5 dropped (degree fell to 1)
      (3L, 4L, 6L, 1L),  // fixpoint: the K4
      (4L, 4L, 6L, 1L)))
    // independent replay on the sf kNN graph: peel in Scala, compare
    val knn = graft.ops.Similarity.lshTopK(
        Tables.embeddings(spark, sf), lit(true), k = 3, numPlanes = 4)
      .select(least(col("probe_id"), col("neighbor_id")).as("a"),
        greatest(col("probe_id"), col("neighbor_id")).as("b"))
      .distinct()
    var cur = knn.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = scala.collection.mutable.ArrayBuffer((
      cur.flatMap(e => Seq(e._1, e._2)).size.toLong, cur.size.toLong))
    for (_ <- 1 to 6) {
      val deg = cur.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      cur = cur.filter(e => deg(e._1) >= 3 && deg(e._2) >= 3)
      expect += ((cur.flatMap(e => Seq(e._1, e._2)).size.toLong, cur.size.toLong))
    }
    val got = SparkEntry.queries("graph_kcore")(spark, sf).orderBy("round")
      .collect().map(r => (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges")))
    assert(got.toSeq == expect.toSeq)
  }

  test("degreeAssortativity: star is -1, cycle is the 0.0 convention, path is -0.5") {
    def r(edges: Seq[(Long, Long)]) =
      Graph.degreeAssortativity(edges.toDF("a", "b")).head()
    val star = r(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L)))
    assert(star.getAs[Long]("n_nodes") == 5 && star.getAs[Long]("n_edges") == 4)
    assert(star.getAs[Double]("assort_r") == -1.0)
    // 4-cycle is degree-regular: zero variance -> documented 0.0
    val cyc = r(Seq((1L,2L),(2L,3L),(3L,4L),(1L,4L)))
    assert(cyc.getAs[Double]("assort_r") == 0.0)
    // path 1-2-3-4: hand-computed moments give exactly -1/2
    val path = r(Seq((1L,2L),(2L,3L),(3L,4L)))
    assert(path.getAs[Double]("assort_r") == -0.5)
    // real corpus: defined and bounded
    val q = SparkEntry.queries("graph_assortativity")(spark, sf).head()
    assert(q.getAs[Long]("n_edges") > 0)
    assert(math.abs(q.getAs[Double]("assort_r")) <= 1.0)
  }

  test("adamicAdar: hand graphs score exactly; adjacent pairs never emit") {
    val w = Graph.aaWeightsU6
    // path 1-2-3-4: the only distance-2 pairs are (1,3) via 2 and
    // (2,4) via 3; both centers have degree 2
    val path = Graph.adamicAdar(Seq((1L,2L),(2L,3L),(3L,4L)).toDF("a","b"), k = 10)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("n_common"), r.getAs[Long]("aa_u6"))).toSet
    assert(path == Set((1L,3L,1L,w(0)), (2L,4L,1L,w(0))))
    // diamond 1-2, 1-3, 2-3, 2-4, 3-4: only (1,4) is non-adjacent,
    // with TWO degree-3 common neighbors — weights must accumulate
    val dia = Graph.adamicAdar(
        Seq((1L,2L),(1L,3L),(2L,3L),(2L,4L),(3L,4L)).toDF("a","b"), k = 10)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("n_common"), r.getAs[Long]("aa_u6"))).toSet
    assert(dia == Set((1L,4L,2L,2*w(1))))
    // weight table: monotone decreasing, w(2)=1e6/ln2 rounded
    assert(w.head == math.round(1e6 / math.log(2.0)))
    assert(w.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("bfsLayers: min-hop from multi-source seeds; isolated seed kept at hop 0") {
    val edges = Seq((1L,2L),(2L,3L),(3L,4L),(4L,5L),(5L,6L),(3L,7L)).toDF("a","b")
    val seeds = Seq(1L, 7L, 99L).toDF("v") // 99 never appears in an edge
    val r = Graph.bfsLayers(edges, seeds, maxHops = 4)
      .collect().map(x => (x.getAs[Long]("v"), x.getAs[Long]("hop"))).toMap
    // 3 is 1 hop from seed 7, which beats its 2-hop path from seed 1
    assert(r == Map(1L -> 0L, 7L -> 0L, 99L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 3L, 6L -> 4L))
    // fixed horizon: maxHops=2 leaves 5 and 6 unreached (absent)
    val r2 = Graph.bfsLayers(edges, seeds, maxHops = 2)
      .collect().map(x => x.getAs[Long]("v")).toSet
    assert(r2 == Set(1L, 2L, 3L, 4L, 7L, 99L))
  }

  test("graph_bfs_layers: frontiers partition the reached set, coverage monotone") {
    val rows = SparkEntry.queries("graph_bfs_layers")(spark, sf).collect()
    assert(rows.nonEmpty && rows.head.getAs[Long]("hop") == 0L)
    val cums = rows.map(_.getAs[Long]("n_cum"))
    assert(cums.zip(rows.map(_.getAs[Long]("n_frontier")))
      .map { case (c, f) => c - f }
      .sameElements(0L +: cums.dropRight(1))) // n_cum = running Σ n_frontier
    val cov = rows.map(_.getAs[Long]("coverage_u4"))
    assert(cov.sameElements(cov.sorted) && cov.last <= 10000L)
  }

  test("labelProp separates two triangles across a bridge, deterministically") {
    // two 3-cliques joined by the single bridge 3-4. Hand-rolled sync
    // rounds with (count desc, label asc) ties converge by round 4 to
    // {1,2,3}→1 and {4,5,6}→3 (the bridge pulls 4's community label to
    // 3 via round-2's {1:1,2:1,3:1,4:4,5:3,6:3} intermediate state)
    val edges = Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(4L,6L),(5L,6L))
      .toDF("a", "b")
    val lab = Graph.labelProp(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // a clique alone collapses to its min id in one round and stays
    val k3 = Graph.labelProp(Seq((7L,8L),(7L,9L),(8L,9L)).toDF("a","b"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(k3.values.toSet == Set(7L))
    // the query's histogram view: two communities of size 3
    val hist = SparkEntry.queries("graph_label_prop")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist.nonEmpty && hist.keys.forall(_ >= 1L))
  }

  test("deflated PC2 replays in Scala, is orthogonal to PC1, captures less variance") {
    val rows = SparkEntry.queries("emb_pca_deflate")(spark, sf)
      .orderBy("pos").collect()
    assert(rows.length == 64)
    val c1 = rows.map(_.getAs[Double]("c1"))
    val c2 = rows.map(_.getAs[Double]("c2"))
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(c1, c1) - 1.0) < 0.01, "c1 not unit norm")
    assert(math.abs(dot(c2, c2) - 1.0) < 0.01, "c2 not unit norm")
    assert(math.abs(dot(c1, c2)) < 0.01, "components not orthogonal")
    // full Scala replay: 3 power iterations, exact deflation, 3 more
    val xs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](1).toArray)
    def iterate(data: Array[Array[Double]]): Array[Double] = {
      var v = Array.fill(64)(1.0 / math.sqrt(64.0))
      for (_ <- 1 to 3) {
        val w = new Array[Double](64)
        data.foreach { x =>
          val d = dot(x, v)
          for (i <- 0 until 64) w(i) += x(i) * d
        }
        val n = math.sqrt(dot(w, w))
        v = w.map(_ / n)
      }
      v
    }
    val r1 = iterate(xs)
    val defl = xs.map { x =>
      val d = dot(x, r1)
      x.zip(r1).map { case (xi, vi) => xi - d * vi }
    }
    val r2 = iterate(defl)
    for (i <- 0 until 64) {
      assert(math.abs(c1(i) - r1(i)) < 1e-3, s"c1@$i")
      assert(math.abs(c2(i) - r2(i)) < 1e-3, s"c2@$i")
    }
    // the leading axis must actually dominate
    val var1 = xs.map(x => math.pow(dot(x, c1), 2)).sum
    val var2 = xs.map(x => math.pow(dot(x, c2), 2)).sum
    assert(var1 >= var2, s"PC1 variance $var1 below PC2 $var2")
  }

  test("centroid outliers: k per label, cosine in [-1,1], ranks contiguous") {
    val out = Embeddings.centroidOutliers(Tables.embeddings(spark, sf), k = 3)
    val rows = out.collect()
    assert(rows.forall { r =>
      val c = r.getAs[Double]("cos"); c >= -1.0001 && c <= 1.0001
    })
    val perLabel = rows.groupBy(_.getAs[Int]("label"))
    assert(perLabel.values.forall(g =>
      g.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to g.length)))
    assert(perLabel.values.forall(_.length <= 3))
  }
}
