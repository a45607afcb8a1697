package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.sources.Sessions.tune(
      SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class MetricsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every metric query runs and returns rows") {
    for ((name, fn) <- queries.MetricQueries.queries) {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("simple sum equals direct aggregation") {
    val df  = SparkEntry.queries("m_simple_sum")(spark, sf)
    val tot = df.agg(org.apache.spark.sql.functions.sum("total_revenue")).head.getDouble(0)
    val raw = graft.sources.Tables.orders(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("o_totalprice")).head.getDouble(0)
    assert(math.abs(tot - raw) < 1.0)
  }

  test("cumulative last row equals grand total") {
    val rows = SparkEntry.queries("m_cumulative")(spark, sf).collect()
    val last = rows.last.getAs[Double]("cumulative_revenue")
    val sum  = rows.map(_.getAs[Double]("monthly_revenue")).sum
    assert(math.abs(last - sum) < 1.0)
  }

  test("ratio is bounded in [0,1] where defined") {
    val bad = SparkEntry.queries("m_ratio")(spark, sf)
      .filter("return_rate_u4 < 0 OR return_rate_u4 > 10000").count()
    assert(bad == 0)
  }

  test("multi_grain has both grains") {
    val grains = SparkEntry.queries("m_multi_grain")(spark, sf)
      .select("grain").distinct().collect().map(_.getString(0)).toSet
    assert(grains == Set("week", "quarter"))
  }

  test("oracle map keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("median_approx scale path tracks exact median") {
    import graft.metrics.{MetricCompiler => MC, MetricDef}
    val li = graft.sources.Tables.lineitem(spark, sf)
    val exact = MC.simple(li, MetricDef("m", "median", "l_extendedprice"), None)
      .head().getDouble(0)
    val approx = MC.simple(li, MetricDef("m", "median_approx", "l_extendedprice"), None)
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx=$approx vs exact=$exact")
  }

  test("quantile calibration: exact rank and histogram estimate both replay") {
    val rows = SparkEntry.queries("sketch_quantile_vs_exact")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_c"), r.getAs[Long]("est_c"),
          r.getAs[Long]("err_u4"))).toMap
    assert(rows.keySet == Set("p50", "p90", "p99"))
    val cents = graft.sources.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("o_totalprice") * 100, 0)
          .cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = cents.sortBy { case (rid, c) => (c, rid) }.map(_._2)
    val n = sorted.length.toLong
    val bins = sorted.groupBy(_ / 100000).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    for ((pct, qn, qd) <- Seq(("p50", 1L, 2L), ("p90", 9L, 10L),
        ("p99", 99L, 100L))) {
      val t = (qn * n + qd - 1) / qd
      val exact = sorted((t - 1).toInt)
      var cum = 0L
      var hit: Option[(Long, Long, Long)] = None
      for ((b, c) <- bins if hit.isEmpty) {
        if (cum + c >= t && cum < t) hit = Some((b, c, cum))
        cum += c
      }
      val (bin, nb, before) = hit.get
      val est = bin * 100000L + 100000L * (t - before) / nb
      val (ec, sc, err) = rows(pct)
      assert(ec == exact, s"$pct exact")
      assert(sc == est, s"$pct est")
      assert(err == math.abs(est - exact) * 10000L / exact, s"$pct err")
      // estimator sanity: the crossing bin contains the exact value
      assert(math.abs(est - exact) <= 100000L, pct)
    }
  }

  test("hll vs exact: error replays and the estimator matches the sketch query") {
    val rows = SparkEntry.queries("sketch_hll_vs_exact")(spark, sf).collect()
    assert(rows.nonEmpty)
    // estimator cross-consistency: same sketch as m_sketch_distinct
    // (daily→monthly max-rho folding is associative, so the two paths
    // must land on identical estimates)
    val est = SparkEntry.queries("m_sketch_distinct")(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getAs[Long]("est_customers")).toMap
    val exact = graft.sources.Tables.orders(spark, sf)
      .groupBy(org.apache.spark.sql.functions.date_trunc("month",
        org.apache.spark.sql.functions.col("o_orderdate")).cast("date")
        .as("period"))
      .agg(org.apache.spark.sql.functions.countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val p = r.getDate(0).toString
      val e = r.getAs[Long]("est_customers")
      val x = r.getAs[Long]("exact_customers")
      assert(e == est(p), s"$p estimator drifted from m_sketch_distinct")
      assert(x == exact(p), s"$p exact count")
      val err = math.abs(e - x) * 10000L / x
      assert(r.getAs[Long]("err_u4") == err)
      assert(r.getAs[Long]("within_3sigma") == (if (err <= 487) 1L else 0L))
    }
  }

  test("referential sweep: orphan counts replay from raw key sets") {
    import graft.sources.Tables
    val rows = SparkEntry.queries("dq_referential")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"),
          r.getAs[Long]("orphan_u6"))).toMap
    def keys(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(org.apache.spark.sql.functions.col(c).cast("long"))
        .collect().map(_.getLong(0))
    val oKeys = keys(Tables.orders(spark, sf), "o_orderkey").toSet
    val cKeys = keys(Tables.customer(spark, sf), "c_custkey").toSet
    val nKeys = keys(Tables.nation(spark, sf), "n_nationkey").toSet
    val checks = Seq(
      ("lineitem.l_orderkey->orders",
        keys(Tables.lineitem(spark, sf), "l_orderkey"), oKeys),
      ("orders.o_custkey->customer",
        keys(Tables.orders(spark, sf), "o_custkey"), cKeys),
      ("customer.c_nationkey->nation",
        keys(Tables.customer(spark, sf), "c_nationkey"), nKeys),
      ("supplier.s_nationkey->nation",
        keys(Tables.supplier(spark, sf), "s_nationkey"), nKeys))
    assert(rows.keySet == checks.map(_._1).toSet)
    checks.foreach { case (name, child, parent) =>
      val orph = child.count(k => !parent(k)).toLong
      assert(rows(name) ==
        ((child.length.toLong, orph, orph * 1000000L / child.length)), name)
    }
  }

  test("weekday chi2: shares and contributions replay from raw order dates") {
    val rows = SparkEntry.queries("m_weekday_chi2")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("dow")).toSeq == (0L to 6L))
    val byDow = graft.sources.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")).as("d"))
      .collect()
      .map(_.getDate(0).toLocalDate.getDayOfWeek.getValue % 7) // SUNDAY→0
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = byDow.values.sum
    val contribs = rows.map { r =>
      val dow = r.getAs[Long]("dow").toInt
      val nd = byDow(dow)
      assert(r.getAs[Long]("n_d") == nd, s"dow $dow")
      assert(r.getAs[Long]("share_u6") == (2 * nd * 1000000L + n) / (2 * n))
      val contrib = (7 * nd - n) * (7 * nd - n) * 10000L / (7 * n)
      assert(r.getAs[Long]("contrib_u4") == contrib, s"dow $dow contrib")
      contrib
    }
    rows.foreach(r => assert(r.getAs[Long]("chi2_u4") == contribs.sum))
  }

  test("multiGrain average path equals per-grain simple aggregation") {
    import graft.metrics.{MetricCompiler => MC, MetricDef}
    val o = graft.sources.Tables.orders(spark, sf)
    val m = MetricDef("avg_price", "average", "o_totalprice", Some("o_orderdate"))
    val rolled = MC.multiGrain(o, m, Seq("month", "quarter"))
      .filter(org.apache.spark.sql.functions.col("grain") === "quarter")
      .orderBy("period").collect()
      .map(r => (r.getAs[java.sql.Date]("period"), r.getAs[Double]("avg_price")))
    val direct = MC.simple(o, m, Some("quarter")).orderBy("period").collect()
      .map(r => (r.getAs[java.sql.Date]("period"), r.getAs[Double]("avg_price")))
    assert(rolled.length == direct.length)
    rolled.zip(direct).foreach { case ((p1, v1), (p2, v2)) =>
      assert(p1 == p2 && math.abs(v1 - v2) < 1e-9, s"$p1: $v1 vs $v2")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query keys are unique: no silent Map-literal shadowing") {
    // Map literals silently keep the LAST duplicate key — r8 found a
    // second "text_perplexity" swallowing the first. Lint the source:
    // each key appears exactly twice per file (query + oracle), in one
    // file only, and the ++-merge loses nothing.
    val dirQ = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val keyRe = """"([a-z0-9_]+)" ->""".r
    import scala.jdk.CollectionConverters._
    val perFile = java.nio.file.Files.list(dirQ).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.map { p =>
        p.getFileName.toString ->
          keyRe.findAllMatchIn(java.nio.file.Files.readString(p))
            .map(_.group(1)).toSeq
      }
    for ((f, ks) <- perFile; (k, n) <- ks.groupBy(identity).map { case (k, v) => k -> v.size })
      assert(n == 2, s"$f: key $k appears $n times (expected query + oracle)")
    val byKey = perFile.flatMap { case (f, ks) => ks.distinct.map(_ -> f) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(byKey.isEmpty, s"keys defined in multiple files: $byKey")
    val sizes = Seq(queries.MetricQueries.queries.size,
      queries.MetaQueries.queries.size, queries.OlapQueries.queries.size,
      queries.PipelineQueries.queries.size)
    assert(sizes.sum == SparkEntry.queries.size,
      s"merged map lost ${sizes.sum - SparkEntry.queries.size} keys to cross-file collisions")
  }

  test("sketch overlap: inclusion-exclusion is consistent and tracks exact counts") {
    import org.apache.spark.sql.functions._
    val r = SparkEntry.queries("m_sketch_overlap")(spark, sf).head()
    val (c, p, u, ov) = (r.getAs[Long]("est_click"), r.getAs[Long]("est_purchase"),
      r.getAs[Long]("est_union"), r.getAs[Long]("est_overlap"))
    // set-algebra sanity: max side <= union <= sum of sides, overlap <= min side
    assert(u >= math.max(c, p) && u <= c + p)
    assert(ov >= 0 && ov <= math.min(c, p))
    // each estimate within HLL error of the exact distinct (m=4096 => ~1.6% se)
    val e = graft.sources.Tables.events(spark, sf)
    def exact(t: String) = e.filter(col("event_type") === t)
      .select("user_id").distinct().count()
    val (ec, ep) = (exact("click"), exact("purchase"))
    val eu = e.filter(col("event_type").isin("click", "purchase"))
      .select("user_id").distinct().count()
    assert(math.abs(c - ec).toDouble / ec < 0.05, s"click $c vs $ec")
    assert(math.abs(p - ep).toDouble / ep < 0.05, s"purchase $p vs $ep")
    assert(math.abs(u - eu).toDouble / eu < 0.05, s"union $u vs $eu")
  }

  test("Wilson interval brackets the point rate with a width bounded by the worst case") {
    val rows = SparkEntry.queries("m_rate_wilson")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n_items"),
        r.getAs[Double]("wilson_lo"), r.getAs[Double]("wilson_hi"))
      val rate = r.getAs[Long]("rate_u4") / 10000.0
      assert(lo >= 0.0 && hi <= 1.0 && lo < hi)
      // the score interval always contains the MLE point estimate
      assert(lo <= rate + 5e-5 && rate - 5e-5 <= hi,
        s"rate $rate outside [$lo, $hi]")
      // width can never exceed the p=1/2 worst case (+ rounding slack)
      val maxW = 2 * 1.96 * math.sqrt(0.25 / n) + 2e-4
      assert(hi - lo <= maxW, s"width ${hi - lo} > $maxW at n=$n")
    }
  }

  test("autocorr: lags replay the x-n-centered integer moments") {
    import org.apache.spark.sql.functions.{col, sum, to_date, datediff, lit}
    val rows = SparkEntry.queries("m_autocorr")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).sameElements(1L to 7L))
    val y = graft.sources.Tables.orders(spark, sf)
      .groupBy(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).as("dn"))
      .agg(sum(graft.queries.Exact.cents(col("o_totalprice"))).as("y"))
      .orderBy("dn").collect().map(r => BigInt(r.getAs[Long]("y")))
    val n = BigInt(y.length)
    val sy = y.sum
    val z = y.map(v => n * v - sy)
    val dz = z.map(v => v * v).sum
    rows.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      assert(r.getAs[Long]("n_pairs") == (y.length - k).toLong)
      val num = (k until y.length).map(t => z(t) * z(t - k)).sum
      val expected = num.toDouble / dz.toDouble
      assert(math.abs(r.getAs[Double]("ac_r") - expected) <= 1e-6,
        s"acf at lag $k")
      assert(math.abs(r.getAs[Double]("ac_r")) <= 1.0)
    }
  }

  test("benford: digit histogram replays the exact-cents first digit") {
    val rows = SparkEntry.queries("m_benford")(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall { r =>
      val d = r.getAs[Long]("digit"); d >= 1 && d <= 9
    })
    // independent replay off the raw cents integers
    import org.apache.spark.sql.functions.col
    val digits = graft.sources.Tables.orders(spark, sf)
      .select(graft.queries.Exact.cents(col("o_totalprice")).as("c"))
      .collect().map(_.getLong(0).toString.head.asDigit.toLong)
    val hist = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = digits.length.toLong
    assert(rows.map(_.getAs[Long]("n_orders")).sum == n)
    rows.foreach { r =>
      val d = r.getAs[Long]("digit")
      assert(r.getAs[Long]("n_orders") == hist(d))
      val share = (2L * hist(d) * 1000000L + n) / (2L * n)
      assert(r.getAs[Long]("share_u6") == share)
      val exp = Math.round(math.log10(1.0 + 1.0 / d) * 1e6)
      assert(r.getAs[Long]("exp_u6") == exp)
      assert(r.getAs[Long]("dev_u6") == math.abs(share - exp))
    }
    // orders totals are organic-ish: low digits must dominate high ones
    val byDigit = rows.map(r => r.getAs[Long]("digit") -> r.getAs[Long]("n_orders")).toMap
    assert(byDigit.getOrElse(1L, 0L) + byDigit.getOrElse(2L, 0L) >
      byDigit.getOrElse(8L, 0L) + byDigit.getOrElse(9L, 0L))
  }

  test("KMV intersection: exact below k, theta-estimator within sketch error above") {
    import org.apache.spark.sql.functions._
    val W = 1L << 40
    val r = SparkEntry.queries("m_sketch_kmv_intersect")(spark, sf).head()
    val (theta, nm, est, exact) = (r.getAs[Long]("theta"), r.getAs[Long]("n_match"),
      r.getAs[Long]("est_intersect"), r.getAs[Long]("exact_intersect"))
    assert(r.getAs[Long]("k_sketch") == 64L)
    assert(theta >= 1 && theta <= W && nm >= 0 && nm <= 64)
    if (theta == W) {
      // exact mode: both sketches hold their whole side, so the
      // candidate count IS the hash intersection and the estimator
      // must collapse to it (and to the true overlap, barring 40-bit
      // collisions, impossible at this corpus size)
      assert(est == nm, "theta=W must make the estimator the identity")
      assert(est == exact, s"exact-mode estimate $est vs true $exact")
    } else {
      // estimate mode: the theta estimator's relative error at k=64 is
      // ~1/sqrt(k) per side; 50% is far outside plausible regression
      assert(exact > 0 && math.abs(est - exact).toDouble / exact < 0.5,
        s"KMV estimate $est drifted from exact $exact")
    }
  }
}
