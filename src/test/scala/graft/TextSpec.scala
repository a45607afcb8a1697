package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.RollingHash
import graft.ops.{Multimodal, TextAnalysis}
import graft.sources.Tables

class TextSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("char_entropy matches hand-computed values and is order-stable") {
    import graft.functions.CharEntropy.entropy
    assert(entropy(Array.empty[Byte]) == 0.0)
    assert(entropy("aaaa".getBytes("UTF-8")) == 0.0)
    assert(entropy("abab".getBytes("UTF-8")) == 1.0) // two symbols, 50/50
    assert(math.abs(entropy("abcd".getBytes("UTF-8")) - 2.0) < 1e-12)
    // entropy is a bag-of-bytes property — permutation-invariant
    assert(entropy("hello world".getBytes("UTF-8")) ==
      entropy("world olleh".getBytes("UTF-8")))
  }

  test("GraftExtensions wires all custom functions") {
    // builder-time path: applying the extension must register cleanly
    new graft.functions.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    // live-session path: every function resolves and runs from SQL
    graft.functions.GraftExtensions.registerAll(spark)
    val r = Tables.documents(spark, sf).limit(5)
      .selectExpr("rolling_hash(text, 8) AS rh")
      .agg(count("rh")).head().getLong(0)
    assert(r == 5)
    val m = Tables.documents(spark, sf).limit(5)
      .selectExpr("doc_id", "explode(split(text, ' ')) AS t")
      .groupBy("doc_id").agg(expr("minhash_agg(t, 8)").as("sig"))
      .count()
    assert(m == 5)
    val sh = Tables.documents(spark, sf).limit(5)
      .selectExpr("size(word_shingles(text, 3)) AS n").agg(sum("n")).head().getLong(0)
    assert(sh > 0)
    val dp = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(dp == 11.0)
    val ap = spark.sql(
      "SELECT array_pairs(array(1L, 2L, 3L)) AS p").head()
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p")
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ap.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val ce = spark.sql("SELECT char_entropy('abab') AS e").head().getDouble(0)
    assert(ce == 1.0)
  }

  test("rolling hash: codegen result equals the plain Scala reference") {
    RollingHash.register(spark)
    val inputs = Seq("", "a", "abc", "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaa", "padding-" + ("x" * 100))
    val df  = inputs.toDF("text").select(col("text"), expr("rolling_hash(text, 16)").as("h"))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    inputs.foreach { s =>
      val want = RollingHash.minWindowHash(s.getBytes("UTF-8"), 16)
      assert(got(s) == want, s"mismatch for '$s'")
    }
  }

  test("rolling hash runs inside WholeStageCodegen") {
    RollingHash.register(spark)
    // a real source, not a literal — literals constant-fold to LocalTableScan
    val df = Tables.documents(spark, sf).select(expr("rolling_hash(text, 4)"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into WholeStageCodegen stage n
    assert(plan.contains("*(1) Project [rolling_hash"), s"expected codegen in:\n$plan")
  }

  test("rolling hash is shift-invariant at window granularity") {
    // the minimum window hash of a doc is unchanged when content moves
    // (same windows exist, just elsewhere) as long as the min window survives
    val a = RollingHash.minWindowHash("PREFIX shared-window-content SUFFIX".getBytes, 8)
    val b = RollingHash.minWindowHash("OTHER shared-window-content TAIL".getBytes, 8)
    // both contain all windows of " shared-window-content " — minima can only
    // come from there or their local extras; equality is not guaranteed in
    // general, but the shared windows bound both minima above
    val shared = RollingHash.minWindowHash(" shared-window-content ".getBytes, 8)
    assert(a <= shared && b <= shared)
  }

  test("token stats and quality agree on a hand-computed doc") {
    val docs = Seq((7L, "The the cat! sat on THE mat...")).toDF("doc_id", "text")
    val t = TextAnalysis.tokenStats(docs).head()
    assert(t.getAs[Int]("n_tokens") == 7)     // the the cat sat on the mat
    assert(t.getAs[Int]("n_uniq") == 5)
    val q = TextAnalysis.quality(docs).head()
    assert(q.getAs[Int]("n_tokens") == 7)
    assert(q.getAs[Double]("dup_ratio") > 0.0)
    assert(q.getAs[Double]("quality_score") >= 0.0 && q.getAs[Double]("quality_score") <= 1.0)
  }

  test("langid predicts deterministically and exposes per-language hits") {
    val out = TextAnalysis.langId(Tables.documents(spark, sf))
    assert(out.count() == 500)
    val langs = TextAnalysis.markers.map(_._1).toSet
    assert(out.select("predicted").distinct().collect()
      .map(_.getString(0)).forall(langs.contains))
  }

  test("bigram NLL: MLE, backoff, and OOV floor match hand-computed probabilities") {
    // train = lower doc_id half ({0,1}): c1 = {a:4, b:3, c:1}, T = 8,
    // c2 = {(a,b):2, (b,a):3, (a,c):1}
    val docs = Seq(
      (0L, "a b a c"), (1L, "b a b a"),
      (2L, "a b z a"), // seen bigram + OOV-token backoff + unseen-prev backoff
      (3L, "c b"))     // seen tokens, unseen bigram -> unigram backoff
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_scored"), r.getAs[Long]("n_backoff"),
          r.getAs[Double]("avg_nll"))).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 2: -ln(2/4.0), -ln(0.4*(1/8.0)) [z OOV], -ln(0.4*(4/8.0)) [prev z]
    val d2 = Seq(-math.log(2 / 4.0), -math.log(0.4 * (1 / 8.0)),
      -math.log(0.4 * (4 / 8.0)))
    assert(out(2L) == ((3L, 2L, r4(d2.sum / 3))))
    // doc 3: single unseen bigram (c,b) -> -ln(0.4*(3/8.0))
    assert(out(3L) == ((1L, 1L, r4(-math.log(0.4 * (3 / 8.0))))))
    // train docs score fully in-model: zero backoff by construction
    assert(out(0L)._2 == 0L && out(1L)._2 == 0L)
    // doc 0: bigrams (a,b),(b,a),(a,c) -> MLE ratios over prev counts
    val d0 = Seq(-math.log(2 / 4.0), -math.log(3 / 3.0), -math.log(1 / 4.0))
    assert(out(0L) == ((3L, 0L, r4(d0.sum / 3))))
  }

  test("BM25 ranks by rarity, saturates term frequency, and length-normalizes") {
    import graft.ops.Corpus
    val corpus = Seq(
      (10L, "zephyr alpha beta gamma"),                  // rare term, short
      (11L, "zephyr zephyr zephyr zephyr alpha beta gamma"), // tf-saturated
      (12L, "zephyr alpha beta gamma delta epsilon eta theta iota kappa"),
      (13L, "alpha beta gamma delta"),                   // no query term
      (14L, "common common common common"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "zephyr")).toDF("doc_id", "text")
    val out = Corpus.bm25TopK(corpus, queries, k = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rnk"), r.getAs[Double]("score"))).toMap
    // only zephyr-bearing docs retrieved at all
    assert(out.keySet == Set(10L, 11L, 12L))
    val (s10, s11, s12) = (out(10L)._2, out(11L)._2, out(12L)._2)
    // length normalization: same tf=1, the shorter doc outranks
    assert(s10 > s12, s"short doc must beat long at equal tf: $s10 vs $s12")
    // saturation: 4x the tf buys well under 4x the score
    assert(s11 > s10 && s11 < 4 * s10,
      s"tf must saturate, not scale linearly: $s11 vs $s10")
    assert(out(11L)._1 == 1L, "highest score ranks first")
  }

  test("nDCG@10 replays from the k=10 ranking and respects its bounds") {
    import graft.ops.Corpus
    val d = Tables.documents(spark, sf)
    val langs = d.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val top = Corpus.bm25TopK(d.filter(col("doc_id") >= 25),
        d.filter(col("doc_id") < 25), k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id")))
    // independent replica of the plan-time discounts
    val w = (1 to 10).map(i => Math.round(1e6 / (math.log(i + 1) / math.log(2))))
    val prefix = w.scanLeft(0L)(_ + _)
    val nLang = langs.filter(_._1 >= 25).groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val rows = SparkEntry.queries("text_bm25_ndcg")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("q_id")).toSet == (0L until 25L).toSet)
    rows.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val nRel = nLang.getOrElse(langs(q), 0L)
      assert(r.getAs[Long]("n_rel") == nRel)
      val dcg = top.filter(_._1 == q)
        .map { case (_, rnk, doc) =>
          if (langs(doc) == langs(q)) w(rnk.toInt - 1) else 0L }.sum
      assert(r.getAs[Long]("dcg_u6") == dcg, s"dcg of query $q")
      val idcg = prefix(math.min(nRel, 10L).toInt)
      assert(r.getAs[Long]("idcg_u6") == idcg)
      val ndcg = if (idcg > 0) dcg * 10000L / idcg else 0L
      assert(r.getAs[Long]("ndcg_u4") == ndcg)
      assert(ndcg >= 0L && ndcg <= 10000L)
    }
    // BM25 with same-lang relevance must beat a zero ranking overall
    assert(rows.map(_.getAs[Long]("ndcg_u4")).sum > 0L)
  }

  test("fingerprints are stable and distinct across distinct docs") {
    val fp = TextAnalysis.fingerprints(Tables.documents(spark, sf))
    assert(fp.count() == 500)
    assert(fp.select("fp_full").distinct().count() == 500) // no exact dups in testdata
  }

  test("repetition flags copy-paste loops, not normal prose") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"), // one distinct 3-gram
      (2L, "every word here is completely different from the others"),
      (3L, "ab")) // fewer than 3 tokens -> no ngrams, ratio 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("rep_ratio") > 0.8)   // 8 occurrences, 1 distinct
    assert(out(1).getAs[Double]("rep_ratio") == 0.0)  // all distinct
    assert(out(2).getAs[Long]("n_ngrams") == 0L && out(2).getAs[Double]("rep_ratio") == 0.0)
  }

  test("contamination: embedded benchmark item maxes containment, clean doc absent") {
    val bench = Seq((1L, "the secret benchmark answer is forty two exactly")).toDF("doc_id", "text")
    val corpus = Seq(
      // embeds the full benchmark text inside a slightly longer doc:
      // 11 tokens -> 9 shingles, 6 shared -> containment 0.667
      (100L, "filler then the secret benchmark answer is forty two exactly end"),
      // shares zero 3-grams with the benchmark
      (101L, "completely unrelated words about weather patterns today"))
      .toDF("doc_id", "text")
    val out = graft.ops.Contamination.check(corpus, bench, n = 3, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.contains(100L) && !out.contains(101L))
    val hit = out(100L)
    assert(hit.getAs[Long]("bench_id") == 1L)
    assert(hit.getAs[Long]("contaminated") == 1L)
    // 6 of the doc's 9 shingles come from the embedded benchmark item
    assert(hit.getAs[Double]("containment") == 0.6667)
  }

  test("unigram NLL separates rare-token docs from common-token loops") {
    val docs = Seq(
      (1L, "common common common common common common common common"),
      (2L, "common common common common rare1 rare2 rare3 rare4"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.unigramNll(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_toks") == 8 && out(2L).getAs[Long]("n_toks") == 8)
    // doc 1 is all corpus-dominant tokens -> low NLL; doc 2 mixes
    // singletons -> strictly higher mean NLL
    val (nll1, nll2) = (out(1L).getAs[Double]("avg_nll"), out(2L).getAs[Double]("avg_nll"))
    assert(nll1 < nll2, s"$nll1 vs $nll2")
    // exact check: p(common)=12/16, p(rare_i)=1/16
    val ln = (x: Double) => math.log(x)
    val exp1 = -ln(12.0 / 16)
    val exp2 = (4 * -ln(12.0 / 16) + 4 * -ln(1.0 / 16)) / 8
    assert(math.abs(nll1 - exp1) < 5e-4 && math.abs(nll2 - exp2) < 5e-4)
  }

  test("contamination spans: longest matched token run, exact offsets") {
    graft.functions.Shingles.register(spark)
    // word_shingles_seq keeps duplicates in sequence order (index =
    // token offset) where word_shingles dedups
    val seqSh = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
      .select(call_function("word_shingles_seq", col("text"), lit(3)).as("sh"))
      .head().getAs[scala.collection.Seq[String]]("sh")
    assert(seqSh.toSeq ==
      Seq("a b c", "b c d", "c d a", "d a b", "a b c", "b c d"))

    val bench = Seq((1L, "the secret benchmark answer is forty two exactly"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // tokens 0..1 filler, 2..9 the benchmark item, 10 trailer:
      // matched shingle positions 2..7 → span tokens [2, 9], len 8
      (100L, "filler then the secret benchmark answer is forty two exactly end"),
      // TWO separated matches: "the secret benchmark answer" at tokens
      // 1..4 (shingle positions 1-2) and again at 8..11 (positions
      // 8-9) with a longer tail "is forty two" extending the second
      // run (positions 8..10) → longest island must be the SECOND
      (101L, "x the secret benchmark answer y z q the secret benchmark answer is forty two"))
      .toDF("doc_id", "text")
    val out = graft.ops.Contamination.spans(corpus, bench, n = 3, threshold = 0.1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getAs[Long]("start_tok") == 2L)
    assert(out(100L).getAs[Long]("end_tok") == 9L)
    assert(out(100L).getAs[Long]("span_tokens") == 8L)
    // doc 101: islands at positions {1,2} and {8,9,10,11,12}; longest
    // is the second → tokens [8, 14]
    assert(out(101L).getAs[Long]("start_tok") == 8L)
    assert(out(101L).getAs[Long]("end_tok") == 14L)
    assert(out(101L).getAs[Long]("span_tokens") == 7L)
  }

  test("multimodal: frame sampling covers every stride-th bounded chunk") {
    val docs = Seq((1L, "x" * 300)).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(docs, frameSize = 64, stride = 4).collect()
    // 300 bytes → ceil(300/64)=5 frames → sampled idx 0 and 4
    assert(frames.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 4L))
    assert(frames.head.getAs[Long]("frame_len") == 64L)
    assert(frames.last.getAs[Long]("frame_len") == 300L - 4 * 64)
    // 'x' = 0x78: the hex fingerprint of the leading 8 frame bytes
    assert(frames.forall(_.getAs[String]("frame_hex") == "78" * 8))
  }

  test("multimodal: resize stub emits exactly outBytes, cycling content") {
    val docs = Seq((1L, "abcd"), (2L, "xyz")).toDF("doc_id", "text")
    val out = Multimodal.payload(docs)
      .select(col("doc_id"), Multimodal.resizeStub(col("payload"), 10).as("r"))
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[Array[Byte]]("r").length == 10))
    assert(new String(out(0).getAs[Array[Byte]]("r"), "UTF-8") == "abcdabcdab")
    assert(new String(out(1).getAs[Array[Byte]]("r"), "UTF-8") == "xyzxyzxyzx")
  }

  test("multimodal: decode stub yields plausible deterministic metadata") {
    val docs = Seq((1L, "some payload"), (2L, "some payload")).toDF("doc_id", "text")
    val m = Multimodal.decoded(docs).select("media.*").collect()
    assert(m(0) == m(1)) // deterministic
    assert(m(0).getAs[Int]("width") >= 1 && m(0).getAs[Int]("height") >= 1)
    assert(m(0).getAs[scala.collection.Seq[Double]]("features").length == 8)
  }

  test("filter funnel conserves flow: n_out(k) == n_in(k+1), drops sum to total - survivors") {
    val rows = SparkEntry.queries("corpus_filter_funnel")(spark, SparkTestSession.sf)
      .collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 4)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_out") == b.getAs[Long]("n_in"),
        s"flow broken between stage ${a.getAs[Long]("stage")} and ${b.getAs[Long]("stage")}")
    }
    val total    = rows.head.getAs[Long]("n_in")
    val dropped  = rows.map(_.getAs[Long]("n_dropped")).sum
    val survived = rows.last.getAs[Long]("n_out")
    assert(dropped + survived == total)
    // and the funnel agrees with the chain's per-doc keep flags
    val kept = SparkEntry.queries("text_filter_chain")(spark, SparkTestSession.sf)
      .agg(org.apache.spark.sql.functions.sum("keep")).head.getLong(0)
    assert(kept == survived, s"funnel says $survived survivors, chain says $kept")
  }

  test("pmi ranks a true collocation above independent co-occurrences") {
    import spark.implicits._
    // "new york" only ever appears as a pair (6 times); "red" and
    // "car" are both frequent but never adjacent; filler words pad the
    // totals. With floor 2 the only qualifying collocated pair must
    // rank first with pmi > 0.
    val docs = (
      Seq.fill(6)("we visited new york last spring") ++
      Seq.fill(6)("the red house and a blue car") ++
      Seq.fill(4)("a car and the red paint dried")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = graft.ops.TextAnalysis.pmi(docs, minCount = 2, k = 50).collect()
    // PMI favors the rarest always-adjacent pair: "paint dried"
    // (c12=4, c1=c2=4 → ratio 1/4) beats the six "new york"-doc
    // bigrams (c12=6, c1=c2=6 → ratio 1/6)
    val top = rows.head
    assert((top.getAs[String]("w1"), top.getAs[String]("w2")) == ("paint", "dried"))
    assert(top.getAs[Double]("pmi") > 0)
    val ny = rows.find(r => r.getAs[String]("w1") == "new" &&
      r.getAs[String]("w2") == "york").get
    // counts: "new"/"york" appear only in the 6 pair docs
    assert(ny.getAs[Long]("c12") == 6 && ny.getAs[Long]("c1") == 6 &&
      ny.getAs[Long]("c2") == 6)
    // exact PMI replay: n1 tokens, nb bigrams, same double composition
    val n1 = 6*6 + 6*7 + 4*7
    val nb = 6*5 + 6*6 + 4*6
    val exp = math.log((6.0 * n1 * n1) / (nb.toDouble * 6 * 6))
    assert(math.abs(ny.getAs[Double]("pmi") - exp) < 5e-5)
    // "red car" never adjacent → no row despite both words frequent
    assert(!rows.exists(r => r.getAs[String]("w1") == "red" &&
      r.getAs[String]("w2") == "car"))
    // every emitted pair respects the floor
    assert(rows.forall(_.getAs[Long]("c12") >= 2))
  }

  test("readability: band histogram replays the integer Flesch off the raw text") {
    val rows = SparkEntry.queries("text_readability")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    def runs(s: String, re: String): Long = re.r.findAllIn(s).length.toLong
    def huDiv(n: Long, d: Long): Long = (2 * n + d) / (2 * d)
    val scores = graft.sources.Tables.documents(spark, SparkTestSession.sf)
      .select("text").collect().map(_.getString(0)).map { t =>
        val lo = t.toLowerCase
        val w  = runs(lo, "[a-z0-9]+")
        val sn = math.max(runs(t, "[.!?]+"), 1L)
        val sy = runs(lo, "[aeiouy]+")
        206835L - huDiv(1015 * w, sn) - huDiv(84600 * sy, math.max(w, 1L))
      }
    val bands = scores.map(s =>
      if (s < 30000) 0L else if (s < 50000) 1L else if (s < 60000) 2L
      else if (s < 70000) 3L else if (s < 80000) 4L
      else if (s < 90000) 5L else 6L)
    val hist = bands.zip(scores).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(rows.length == hist.size)
    rows.foreach { r =>
      val ss = hist(r.getAs[Long]("band"))
      assert(r.getAs[Long]("n_docs") == ss.length.toLong)
      assert(r.getAs[Long]("mean_score_m3") == ss.sum / ss.length)
      assert(r.getAs[Long]("min_score_m3") == ss.min)
      assert(r.getAs[Long]("max_score_m3") == ss.max)
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum == scores.length.toLong)
  }

  test("naive backtest: MAEs and winner replay from the raw daily series") {
    val rows = SparkEntry.queries("events_naive_backtest")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    val daily = graft.sources.Tables.events(spark, SparkTestSession.sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("dn"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(r => r.getAs[Int]("dn") -> r.getAs[Long]("y")).toMap)
      .toMap
    rows.foreach { r =>
      val ser = daily(r.getAs[String]("event_type"))
      val evals = ser.keys.toSeq
        .filter(t => ser.contains(t - 1) && ser.contains(t - 7)).sorted
      assert(r.getAs[Long]("n_evals") == evals.length.toLong)
      val sl = evals.map(t => math.abs(ser(t) - ser(t - 1))).sum
      val ss = evals.map(t => math.abs(ser(t) - ser(t - 7))).sum
      val n = evals.length.toLong
      assert(r.getAs[Long]("mae_last_u4") == (2 * 10000 * sl + n) / (2 * n))
      assert(r.getAs[Long]("mae_seasonal_u4") == (2 * 10000 * ss + n) / (2 * n))
      val w = if (ss < sl) "seasonal" else if (ss > sl) "last" else "tie"
      assert(r.getAs[String]("winner") == w)
    }
  }

  test("theil-sen: slope is the positional median of quantized pairwise slopes") {
    val rows = SparkEntry.queries("events_theil_sen")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    // independent replay off the raw daily series
    val daily = graft.sources.Tables.events(spark, SparkTestSession.sf)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("dn"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(r => (r.getAs[Int]("dn"), r.getAs[Long]("y")))
        .sortBy(_._1)).toMap
    assert(rows.length == daily.count(_._2.length >= 2))
    rows.foreach { r =>
      val ser = daily(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") == ser.length.toLong)
      val slopes = (for {
        i <- ser.indices; j <- (i + 1) until ser.length
      } yield (ser(j)._2 - ser(i)._2) * 1000000L / (ser(j)._1 - ser(i)._1))
        .sorted // JVM / truncates toward zero, same as div and //
      val np = slopes.length.toLong
      assert(r.getAs[Long]("n_pairs") == np)
      val med = (slopes(((np + 1) / 2).toInt - 1)
        + slopes((np / 2 + 1).toInt - 1)) / 2
      assert(r.getAs[Long]("ts_slope_u6") == med,
        s"median for ${r.getAs[String]("event_type")}")
    }
  }

  test("holt: emitted level/trend replay the recurrence from the emitted series") {
    // replays the α=1/2 β=3/10 micro-unit integer recurrence per
    // event_type over the query's own emitted y series — init
    // (y₁·10⁶, 0), then lvl' = huDiv2(y·10⁶ + lvl + tr),
    // tr' = huDiv10(3(lvl'−lvl) + 7tr), half-up integer division —
    // and checks EXACT equality with level_u6/trend_u6/fc7_u6, plus
    // that the integer path tracks true float Holt within 1e-5
    def hu(n: Long, d: Long): Long = Math.floorDiv(2 * n + d, 2 * d)
    val rows = SparkEntry.queries("events_holt")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val srt = rs.sortBy(_.getAs[java.sql.Date]("dt").toString)
      var lvl = srt.head.getAs[Long]("y") * 1000000L
      var tr  = 0L
      var flvl = srt.head.getAs[Long]("y").toDouble
      var ftr  = 0.0
      srt.zipWithIndex.foreach { case (r, i) =>
        if (i > 0) {
          val y = r.getAs[Long]("y")
          val nl = hu(y * 1000000L + lvl + tr, 2L)
          tr  = hu(3L * (nl - lvl) + 7L * tr, 10L)
          lvl = nl
          val fnl = 0.5 * y + 0.5 * (flvl + ftr)
          ftr  = 0.3 * (fnl - flvl) + 0.7 * ftr
          flvl = fnl
        }
        assert(r.getAs[Long]("level_u6") == lvl, s"level@$i")
        assert(r.getAs[Long]("trend_u6") == tr, s"trend@$i")
        assert(r.getAs[Long]("fc7_u6") == lvl + 7L * tr, s"fc7@$i")
        // the quantized recurrence stays glued to the real one
        assert(math.abs(lvl / 1e6 - flvl) < 1e-3, s"level drift@$i")
        assert(math.abs(tr / 1e6 - ftr) < 1e-3, s"trend drift@$i")
      }
    }
  }

  test("holt-winters: level/trend/seasonal replay the triple recurrence exactly") {
    // replays the α=1/2 β=3/10 γ=1/2 period-7 micro-unit recurrence
    // per event_type: init lvl₀ = week-1 integer mean, s_i = y_i·10⁶ −
    // lvl₀, tr₀ = 0; the seasonal queue rotates one slot per day
    def hu(n: Long, d: Long): Long = Math.floorDiv(2 * n + d, 2 * d)
    val daily = graft.sources.Tables.events(spark, SparkTestSession.sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("dt"))
      .agg(count(lit(1)).as("y"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date](1).toString, r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    val rows = SparkEntry.queries("events_holt_winters")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val ys = daily(t)
      assert(ys.length >= 8 && rs.length == ys.length - 7)
      val lvl0 = ys.take(7).sum * 1000000L / 7
      var seas = ys.take(7).map(_ * 1000000L - lvl0)
      var lvl = lvl0; var tr = 0L
      val srt = rs.sortBy(_.getAs[java.sql.Date]("dt").toString)
      srt.zipWithIndex.foreach { case (r, i) =>
        val y = ys(i + 7)
        val sm7 = seas.head
        val nl = hu(y * 1000000L - sm7 + lvl + tr, 2L)
        val nt = hu(3L * (nl - lvl) + 7L * tr, 10L)
        val ns = hu(y * 1000000L - nl + sm7, 2L)
        seas = seas.tail :+ ns; lvl = nl; tr = nt
        assert(r.getAs[Long]("y") == y, s"$t y@$i")
        assert(r.getAs[Long]("level_u6") == lvl, s"$t level@$i")
        assert(r.getAs[Long]("trend_u6") == tr, s"$t trend@$i")
        assert(r.getAs[Long]("seasonal_u6") == ns, s"$t seasonal@$i")
        assert(r.getAs[Long]("fc7_u6") == lvl + 7L * tr + ns, s"$t fc7@$i")
      }
    }
    // the seasonal component must carry real structure, not stay flat
    assert(rows.map(_.getAs[Long]("seasonal_u6")).distinct.length > 1)
  }

  test("cusum: statistic replays Page's recurrence; a simulated level shift alarms") {
    // exact replay of the ×10⁶ integer recurrence per event_type over
    // the query's own emitted y series: μ₀ = first-28-day integer
    // mean, κ = μ₀/20, S = max(0, S + y·10⁶ − μ₀ − κ), alarm S > μ₀
    val rows = SparkEntry.queries("events_cusum")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val srt = rs.sortBy(_.getAs[java.sql.Date]("dt").toString)
      val ys = srt.map(_.getAs[Long]("y"))
      val mu = ys.take(28).sum * 1000000L / math.min(ys.length, 28)
      val k = mu / 20
      var s = 0L
      srt.zipWithIndex.foreach { case (r, i) =>
        s = math.max(0L, s + ys(i) * 1000000L - mu - k)
        assert(r.getAs[Long]("cusum_u6") == s, s"cusum of $t @$i")
        assert(r.getAs[Long]("alarm") == (if (s > mu) 1L else 0L))
      }
    }
    // sensitivity: a +10% persistent shift after the reference window
    // must raise an alarm within ~11 days (10 days of 0.05μ excess
    // crosses h = μ), while a flat series never alarms — replay the
    // detector in Scala on two synthetic series to pin the semantics
    def detect(ys: Seq[Long]): Seq[Boolean] = {
      val mu = ys.take(28).sum * 1000000L / math.min(ys.length, 28)
      val k = mu / 20
      ys.scanLeft(0L)((s, y) => math.max(0L, s + y * 1000000L - mu - k))
        .tail.map(_ > mu)
    }
    val flat = Seq.fill(60)(1000L)
    assert(!detect(flat).exists(identity), "flat series must not alarm")
    val shifted = Seq.fill(28)(1000L) ++ Seq.fill(32)(1100L)
    val firstAlarm = detect(shifted).indexOf(true)
    assert(firstAlarm >= 28 && firstAlarm <= 50,
      s"level shift should alarm soon after day 28, got $firstAlarm")
  }

  test("collapse repeats: run heads replay from per-user ordered streams") {
    val rows = SparkEntry.queries("events_collapse_repeats")(
        spark, SparkTestSession.sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("collapse_u4"))).toMap
    val ev = Tables.events(spark, SparkTestSession.sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val byType = scala.collection.mutable.Map.empty[String, (Long, Long)]
    ev.groupBy(_._1).values.foreach { us =>
      val seq = us.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zipWithIndex.foreach { case (t, i) =>
        val head = if (i == 0 || seq(i - 1) != t) 1L else 0L
        val (n, k) = byType.getOrElse(t, (0L, 0L))
        byType(t) = (n + 1, k + head)
      }
    }
    assert(rows.keySet == byType.keySet)
    byType.foreach { case (t, (n, k)) =>
      assert(rows(t) == ((n, k, (n - k) * 10000L / n)), t)
    }
    // the collapse must actually fire on this bursty synthetic stream —
    // otherwise the audit is vacuous
    assert(byType.values.exists { case (n, k) => k < n })
  }

  test("dict audit: byte totals replay; tiny dicts win, unique text loses") {
    val rows = SparkEntry.queries("layout_dict_audit")(spark, SparkTestSession.sf)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("lang", "source", "text"))
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("lang", "source", "text").collect()
    def replay(vs: Seq[String]) = {
      val byV = vs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nd = byV.size.toLong
      val plain = vs.map(_.getBytes("UTF-8").length.toLong).sum
      val idx = if (nd <= 256) 1L else if (nd <= 65536) 2L
                else if (nd <= 16777216) 3L else 4L
      // keys is a Set — map through an iterator or equal-length values
      // collapse and the byte sum silently shrinks
      val dict = byV.keys.iterator.map(_.getBytes("UTF-8").length.toLong).sum +
        vs.length * idx
      (vs.length.toLong, nd, plain, dict,
        if (plain >= dict) (plain - dict) * 10000L / plain
        else -((dict - plain) * 10000L / plain))
    }
    for ((name, i) <- Seq("lang" -> 0, "source" -> 1, "text" -> 2)) {
      val e = replay(docs.map(_.getString(i)).toSeq)
      val r = rows(name)
      assert((r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("plain_bytes"), r.getAs[Long]("dict_bytes"),
        r.getAs[Long]("savings_u4")) == e, name)
    }
    // the audit's discriminative power: dictionaries win on the bounded
    // columns and LOSE on unique long text
    assert(rows("lang").getAs[Long]("savings_u4") > 0)
    assert(rows("source").getAs[Long]("savings_u4") > 0)
    assert(rows("text").getAs[Long]("savings_u4") < 0)
  }

  test("truncate loss: all three budgets replay from per-doc token counts") {
    val rows = SparkEntry.queries("seq_truncate_loss")(
        spark, SparkTestSession.sf).collect()
    assert(rows.map(_.getAs[Long]("max_len")).toSeq == Seq(128L, 512L, 2048L))
    val nt = Tables.documents(spark, SparkTestSession.sf)
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong)
    val tot = nt.sum
    rows.foreach { r =>
      val b = r.getAs[Long]("max_len")
      val lost = nt.map(n => math.max(n - b, 0L)).sum
      assert(r.getAs[Long]("n_docs") == nt.length.toLong)
      assert(r.getAs[Long]("n_docs_truncated") == nt.count(_ > b).toLong)
      assert(r.getAs[Long]("tokens_total") == tot)
      assert(r.getAs[Long]("tokens_lost") == lost)
      assert(r.getAs[Long]("loss_u6") == lost * 1000000L / tot)
    }
    // losses shrink as the budget grows
    val ls = rows.map(_.getAs[Long]("tokens_lost"))
    assert(ls(0) >= ls(1) && ls(1) >= ls(2))
  }

  test("dispersion: per-type VMR replays in exact integers") {
    val rows = SparkEntry.queries("events_dispersion")(spark, SparkTestSession.sf)
      .collect()
    val daily = Tables.events(spark, SparkTestSession.sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("y"))).toMap
    assert(rows.map(_.getString(0)).toSet == daily.keySet)
    rows.foreach { r =>
      val ys = daily(r.getString(0)).map(BigInt(_))
      val n = BigInt(ys.length); val sy = ys.sum
      val zz = ys.map(y => (n * y - sy) * (n * y - sy)).sum
      assert(r.getAs[Long]("n_days") == n.toLong)
      assert(r.getAs[Long]("n_events") == sy.toLong)
      assert(r.getAs[Long]("mean_u4") == ((2 * sy * 10000 + n) / (2 * n)).toLong)
      val den = n * (n - 1) * sy
      val vmr = if (den == 0) BigInt(0) else zz * 10000 / den
      assert(r.getAs[Long]("vmr_u4") == vmr.toLong, r.getString(0))
    }
  }

  test("kendall tau-b: exact pair counts replay; tau matches the formula") {
    val row = SparkEntry.queries("events_kendall_tau")(spark, SparkTestSession.sf)
      .head()
    val d = Tables.events(spark, SparkTestSession.sf)
      .groupBy(datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).as("dn"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val pairs = d.combinations(2).map { case Array(a, b) => (a, b) }.toSeq
    val c = pairs.count { case (a, b) =>
      (a._2 < b._2 && a._3 < b._3) || (a._2 > b._2 && a._3 > b._3) }.toLong
    val disc = pairs.count { case (a, b) =>
      (a._2 < b._2 && a._3 > b._3) || (a._2 > b._2 && a._3 < b._3) }.toLong
    val tx = pairs.count { case (a, b) => a._2 == b._2 }.toLong
    val ty = pairs.count { case (a, b) => a._3 == b._3 }.toLong
    val n0 = pairs.length.toLong
    assert((row.getAs[Long]("n_pairs"), row.getAs[Long]("concordant"),
      row.getAs[Long]("discordant"), row.getAs[Long]("ties_x"),
      row.getAs[Long]("ties_y")) == ((n0, c, disc, tx, ty)))
    val tau = row.getAs[Double]("tau_b")
    assert(math.abs(tau) <= 1.0 + 1e-9)
    if (n0 != tx && n0 != ty) {
      val expTau = (c - disc).toDouble /
        (math.sqrt((n0 - tx).toDouble) * math.sqrt((n0 - ty).toDouble))
      assert(math.abs(tau - expTau) < 1e-6)
    }
  }

  test("runs test: median dichotomy, run count and z replay") {
    val row = SparkEntry.queries("events_runs_test")(spark, SparkTestSession.sf)
      .head()
    val d = Tables.events(spark, SparkTestSession.sf)
      .groupBy(datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).as("dn"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val med = d.sortBy(p => (p._2, p._1)).apply((d.length + 1) / 2 - 1)._2
    val kept = d.filter(_._2 != med).sortBy(_._1).map(p => p._2 > med)
    val (nA, nB) = (kept.count(identity).toLong, kept.count(!_).toLong)
    val runs = if (kept.isEmpty) 0L
      else 1L + kept.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    assert(row.getAs[Long]("n_kept") == kept.length.toLong)
    assert(row.getAs[Long]("n_above") == nA)
    assert(row.getAs[Long]("n_below") == nB)
    assert(row.getAs[Long]("runs") == runs)
    if (nA > 0 && nB > 0) {
      val n = kept.length.toDouble
      val e = 2.0 * nA * nB / n + 1.0
      val v = 2.0 * nA * nB * (2.0 * nA * nB - n) / (n * n * (n - 1))
      assert(math.abs(row.getAs[Double]("z") - (runs - e) / math.sqrt(v)) < 1e-5)
    }
  }

  test("crosscorr: every lag replays from the raw daily series; |r| bounded") {
    val rows = SparkEntry.queries("events_crosscorr")(spark, SparkTestSession.sf)
      .collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (-7L to 7L))
    val ds = Tables.events(spark, SparkTestSession.sf)
      .groupBy(datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).as("dn"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val n = ds.length.toLong
    val sx = ds.map(_._2).sum; val sy = ds.map(_._3).sum
    val zx = ds.map { case (dn, x, _) => dn -> (BigInt(n) * x - sx) }.toMap
    val zy = ds.map { case (dn, _, y) => dn -> (BigInt(n) * y - sy) }.toMap
    val dx = zx.values.map(z => z * z).sum
    val dy = zy.values.map(z => z * z).sum
    rows.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      val pairs = zx.keys.filter(dn => zy.contains(dn + k)).toSeq
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong, s"lag $k pairs")
      val num = pairs.map(dn => zx(dn) * zy(dn + k)).sum
      val expR = num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble))
      assert(math.abs(r.getAs[Double]("xc_r") - expR) < 1e-4, s"lag $k r")
      assert(math.abs(r.getAs[Double]("xc_r")) <= 1.0 + 1e-9)
    }
  }

  test("phrase merge: learned phrases and the greedy walk replay per source") {
    val got = SparkEntry.queries("text_phrase_merge")(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("tokens_before"),
          r.getAs[Long]("phrase_merges"), r.getAs[Long]("tokens_after"),
          r.getAs[Long]("merge_rate_u6"))).toMap
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    // learn: discounted-PMI top-20 phrases
    val uni = docs.flatMap(_._2).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val big = docs.flatMap(d => d._2.dropRight(1).zip(d._2.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nb = big.values.sum
    val phrases = big.filter(_._2 > 5).toSeq.map { case ((x, y), cxy) =>
      (s"$x $y", (cxy - 5) * nb * 1000000L / (uni(x) * uni(y)))
    }.sortBy { case (p, sc) => (-sc, p) }.take(20).map(_._1).toSet
    assert(phrases.nonEmpty)
    // apply: greedy non-overlapping left-to-right merge count
    def merges(t: Array[String]): Long = {
      var last = 0L; var cnt = 0L; var i = 1
      while (i < t.length) {
        if (i > last && phrases(s"${t(i - 1)} ${t(i)}")) { last = i + 1; cnt += 1 }
        i += 1
      }
      cnt
    }
    val exp = docs.groupBy(_._1).view.mapValues { ds =>
      val tb = ds.map(_._2.length.toLong).sum
      val mg = ds.map(d => merges(d._2)).sum
      (ds.length.toLong, tb, mg, tb - mg, mg * 1000000L / tb)
    }.toMap
    assert(got == exp)
    // the walk actually fuses something on this template-heavy corpus
    assert(got.values.map(_._3).sum > 0)
  }

  test("content digest: both folds replay and are order-invariant") {
    val rows = SparkEntry.queries("corpus_content_digest")(
        spark, SparkTestSession.sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("digest_xor"),
          r.getAs[Long]("digest_sum"))).toMap
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        graft.functions.GraftHash64.hash(r.getString(1).getBytes("UTF-8"), 13L)))
    val exp = docs.groupBy(_._1).view.mapValues { ds =>
      val hs = ds.map(_._2)
      (ds.length.toLong, hs.reduce(_ ^ _),
        hs.map(_ % 1000000007L).sum % 1000000007L)
    }.toMap
    assert(rows.keySet == exp.keySet)
    exp.foreach { case (s, e) => assert(rows(s) == e, s) }
    // order invariance of the replay fold itself (commutativity check)
    val rev = docs.reverse.groupBy(_._1).view.mapValues { ds =>
      val hs = ds.map(_._2)
      (ds.length.toLong, hs.reduce(_ ^ _),
        hs.map(_ % 1000000007L).sum % 1000000007L)
    }.toMap
    assert(rev == exp)
  }

  test("shard topk audit: recall replays via independent per-shard truncation") {
    val row = SparkEntry.queries("vocab_shard_topk_audit")(
      spark, SparkTestSession.sf).head()
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    val tf = docs.flatMap { case (s, t) => t.map(w => (s, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val shardTop = tf.keys.groupBy(_._1).values.flatMap { ks =>
      ks.toSeq.map { case (s, w) => (w, tf((s, w))) }
        .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1)
    }.toSet
    val global = tf.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1)
    val hit = global.count(shardTop).toLong
    assert(row.getAs[Long]("k") == 20L)
    assert(row.getAs[Long]("n_shards") == docs.map(_._1).distinct.length.toLong)
    assert(row.getAs[Long]("union_size") == shardTop.size.toLong)
    assert(row.getAs[Long]("global_in_union") == hit)
    assert(row.getAs[Long]("recall_u4") == hit * 10000L / 20L)
  }

  test("heaps curve: every prefix row replays; vocabulary growth is monotone") {
    val rows = SparkEntry.queries("text_heaps_curve")(spark, SparkTestSession.sf)
      .collect().map(r => (r.getAs[Long]("pct"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("vocab")))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 5L, 10L, 25L, 50L, 100L))
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)))
    val nIds = docs.map(_._1).max + 1
    rows.foreach { case (pct, nd, nt, v) =>
      val pre = docs.filter(_._1 < nIds * pct / 100)
      assert(nd == pre.length.toLong, s"pct $pct docs")
      assert(nt == pre.map(_._2.length.toLong).sum, s"pct $pct tokens")
      assert(v == pre.flatMap(_._2).distinct.length.toLong, s"pct $pct vocab")
    }
    assert(rows.map(_._4).sliding(2)
      .forall(p => p.length < 2 || p(0) <= p(1)), "vocab must be monotone")
  }

  test("chi2 terms: every emitted cell replays from the raw contingency") {
    val rows = SparkEntry.queries("text_chi2_terms")(spark, SparkTestSession.sf)
      .collect()
    val docs = Tables.documents(spark, SparkTestSession.sf)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSet))
    val n = docs.length.toLong
    val nLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_.getAs[String]("lang")).toSet == nLang.keySet)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq == Seq(1L, 2L, 3L), l)
    }
    rows.foreach { r =>
      val term = r.getAs[String]("term"); val lang = r.getAs[String]("lang")
      val a = docs.count(d => d._2 == lang && d._3(term)).toLong
      val df = docs.count(_._3(term)).toLong
      assert(r.getAs[Long]("df_in_lang") == a && r.getAs[Long]("df") == df)
      assert(df >= 5)
      val nl = nLang(lang)
      val d0 = BigInt(a) * (n - nl - df + a) - BigInt(df - a) * (nl - a)
      val den = BigInt(df) * (n - df) * nl * (n - nl)
      val chi = if (den == 0) BigInt(0) else BigInt(n) * d0 * d0 * 10000 / den
      assert(BigInt(r.getAs[Long]("chi2_u4")) == chi, s"$lang/$term")
    }
  }

  test("varint audit: buckets, byte totals and savings replay from raw postings") {
    val got = SparkEntry.queries("index_varint_audit")(spark, SparkTestSession.sf)
      .collect()
      .map(r => r.getAs[Long]("df_bucket") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("n_postings"),
          r.getAs[Long]("raw_bytes"), r.getAs[Long]("varint_bytes"),
          r.getAs[Long]("savings_u4"))).toMap
    assert(got.nonEmpty)
    val post = Tables.documents(spark, SparkTestSession.sf)
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).toLowerCase.split("[^a-z0-9]+")
        .filter(_.nonEmpty).distinct.map(_ -> r.getLong(0)))
    def vb(g: Long): Long = {
      var b = 1L; var lim = 128L
      while (g >= lim && b < 9) { b += 1; lim <<= 7 }
      b
    }
    val exp = post.groupBy(_._1).values.map { ps =>
      val ids = ps.map(_._2).sorted
      val gaps = (ids.head + 1) +:
        ids.sliding(2).collect { case Array(a, b) => b - a }.toSeq
      (java.lang.Long.highestOneBit(ids.length.toLong), ids.length.toLong,
        gaps.map(vb).sum)
    }.toSeq.groupBy(_._1).view.mapValues { ts =>
      val df = ts.map(_._2).sum
      val vbs = ts.map(_._3).sum
      (ts.length.toLong, df, df * 8, vbs, (df * 8 - vbs) * 10000L / (df * 8))
    }.toMap
    assert(got == exp)
    // the audit's economic direction: denser lists never save LESS
    // (equality is legal at tiny sf where every id fits one byte)
    val minB = got.keys.min; val maxB = got.keys.max
    assert(maxB > minB && got(maxB)._5 >= got(minB)._5)
  }

  test("quality classifier: distributed perceptron equals the in-driver replay") {
    // independent Scala replay of the 8-round halving-step full-batch
    // perceptron from the SAME feature/label tables: the distributed
    // loop's per-round audit numbers and the final weights must match
    // the sequential reference exactly (integer updates are
    // order-independent, so any divergence is a loop bug, not noise)
    import graft.ops.QualityClf
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val rounds = 8
    val fx = QualityClf.features(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lb = QualityClf.labels(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = fx.groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2) }
    var w = Map.empty[Long, Long]
    var refAudit = Vector.empty[(Long, Long, Long, Long)]
    for (rnd <- 1 to rounds) {
      val mis = byDoc.keys.filter { d =>
        lb(d) * byDoc(d).map(b => w.getOrElse(b, 0L)).sum <= 0 }.toSeq
      val step = 1L << (rounds - rnd)
      for (d <- mis; b <- byDoc(d))
        w = w.updated(b, w.getOrElse(b, 0L) + step * lb(d))
      refAudit :+= ((rnd.toLong, mis.size.toLong,
        w.collect { case (b, v) if b >= 0 => math.abs(v) }.sum,
        w.getOrElse(-1L, 0L)))
    }
    val (auditDf, wDf) = QualityClf.train(docs)
    val gotAudit = auditDf.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toVector
    assert(gotAudit == refAudit,
      s"audit diverged: got=$gotAudit ref=$refAudit")
    val gotW = wDf.collect().map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2 != 0L).toMap
    assert(gotW == w.filter(_._2 != 0L), "final weights diverged")
    // the learned gate must beat coin-flip agreement with its teacher
    val m = QualityClf.scoreAgreement(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val agree = m.getOrElse((1L, 1L), 0L) + m.getOrElse((0L, 0L), 0L)
    val total = m.values.sum
    assert(total == lb.size, "matrix cells must cover every doc")
    assert(agree * 100 > total * 55,
      s"agreement ${agree * 100 / total}% is no better than chance")
  }

  test("pack sweep: one cumsum serves all budgets; fill ≤ 1, splits shrink with budget") {
    val rows = SparkEntry.queries("seq_pack_sweep")(spark, SparkTestSession.sf)
      .collect().sortBy(_.getAs[Long]("max_tokens"))
    assert(rows.map(_.getAs[Long]("max_tokens")).toSeq == Seq(512L, 1024L, 2048L))
    val tot = rows.map(_.getAs[Long]("total_tokens")).distinct
    assert(tot.size == 1, "total tokens must not depend on the budget")
    rows.foreach { r =>
      val bins = r.getAs[Long]("n_bins")
      assert(bins == (tot.head + r.getAs[Long]("max_tokens") - 1) / r.getAs[Long]("max_tokens"))
      assert(r.getAs[Double]("fill_rate") <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_docs_split") <= r.getAs[Long]("n_docs"))
    }
  }

  test("piiScrub: injected hits reconcile exactly and redaction leaves zero residual") {
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val t = TextAnalysis.piiScrub(Tables.documents(spark, sf))
      .agg(sum("n_docs").as("n"), sum("n_email").as("e"), sum("n_ip").as("i"),
        sum("n_phone").as("p"), sum("n_card").as("c"),
        sum("n_card_reject").as("cr"), sum("n_residual").as("r"),
        min("chars_cut").as("minCut"))
      .head()
    // exactly one injected hit per matching divisor — the regexes
    // must find each injection ONCE and nothing else
    assert(t.getAs[Long]("n") == ids.length)
    assert(t.getAs[Long]("e") == ids.count(_ % 3 == 0))
    assert(t.getAs[Long]("i") == ids.count(_ % 5 == 0))
    assert(t.getAs[Long]("p") == ids.count(_ % 7 == 0))
    // the Luhn gate: every %11 injection carries a valid check digit
    // and is redacted; every %13 injection fails the checksum and is
    // deliberately LEFT IN PLACE (a rejected candidate is not PII)
    assert(t.getAs[Long]("c") == ids.count(_ % 11 == 0))
    assert(t.getAs[Long]("cr") == ids.count(_ % 13 == 0))
    // redaction is total: re-scanning the cleaned text finds nothing,
    // and every replacement strictly shrinks the text
    assert(t.getAs[Long]("r") == 0L)
    assert(t.getAs[Long]("minCut") >= 0L)
  }

  test("piiApply: the per-doc rewrite matches a driver-side Luhn replay") {
    import TextAnalysis._
    // independent Scala replay of injection + redaction for a sample
    // of docs, md5 included — pins the rewrite byte-for-byte
    def luhnSum(digits: String): Int = digits.reverse.zipWithIndex.map {
      case (ch, k) =>
        val d = ch - '0'
        if (k % 2 == 1) { val x = 2 * d; if (x > 9) x - 9 else x } else d
    }.sum
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = SparkEntry.queries("text_pii_apply")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    docs.take(200).foreach { case (id, text) =>
      val base15 = "4" + ("%014d".format(id % 100000000L))
      val ck = (10 - luhnSum(base15 + "0") % 10) % 10
      val aug = text +
        (if (id % 3 == 0) s" contact u$id@example.com now" else "") +
        (if (id % 5 == 0) s" node 10.${id % 256}.0.${id % 100} up" else "") +
        (if (id % 7 == 0) f" call +1-555-${id % 10000}%04d today" else "") +
        (if (id % 11 == 0) s" card $base15$ck on file" else "") +
        (if (id % 13 == 0) s" ref $base15${(ck + 5) % 10} noted" else "")
      var red = aug.replaceAll(PiiEmailRe, "<EMAIL>")
        .replaceAll(PiiIpRe, "<IP>").replaceAll(PiiPhoneRe, "<PHONE>")
      val cands = PiiCardRe.r.findAllIn(red).toList
      cands.filter(c => luhnSum(c) % 10 == 0)
        .foreach(c => red = red.replace(c, "<CARD>"))
      val row = rows(id)
      assert(row.getAs[String]("red_md5") == md5hex(red),
        s"doc $id rewrite diverged")
      assert(row.getAs[Long]("n_card") ==
        cands.count(c => luhnSum(c) % 10 == 0).toLong)
      assert(row.getAs[Long]("chars_cut") == (aug.length - red.length).toLong)
      assert(row.getAs[Long]("n_residual") == 0L)
    }
    // the gate's two sides both occur in the fixture
    assert(docs.exists(_._1 % 11 == 0) && docs.exists(_._1 % 13 == 0))
  }
}
