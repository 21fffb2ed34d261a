package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming side of the engine (SURVEY.md §2.F): the CDR
  * pipeline's per-window features computed continuously instead of by
  * the reference's batch re-scans (data_process.py slices by month/week
  * — here a watermark + window does the slicing incrementally).
  *
  * Works over any streaming `events`-shaped DataFrame (readStream from
  * files/Kafka in production, MemoryStream in specs). All operators are
  * also valid on batch frames — specs exercise both paths.
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

  /** Timestamp → µs since epoch, shared by every state operator that
    * orders by event time. floorDiv, not `/`: getTime is negative for
    * pre-epoch instants while getNanos still counts FORWARD within the
    * second, so truncating division would flip their ordering
    * (1969-12-31T23:59:59.9 → +900000µs instead of −100000µs). */
  private def tsMicros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000

  case class SessionOut(user_id: Long, session_start: Long,
    session_end: Long, n_events: Long, total_value: Double)

  /** (start, last, n, total) — tuple state: encoder-friendly in codegen */
  private type SessionState = (Long, Long, Long, Double)

  /** Watermarked sliding-window aggregation: per event_type counts and
    * value sums over 10-minute tumbling windows, tolerating 1 hour of
    * event-time lateness. Partial aggregation happens map-side before
    * the window-key shuffle — the plan a 1000-executor cluster wants. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup — the continuous twin of ops.Text q30:
    * duplicate payloads (same content hash) within the watermark horizon
    * are dropped on arrival. State is bounded by the watermark: Spark
    * evicts seen-keys older than the horizon, which is what makes exact
    * dedup feasible on an unbounded crawl stream. */
  def dedupStream(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream→lake sink: append-mode parquet with an exactly-once
    * checkpoint. The standard landing pattern at scale — finalized
    * watermarked windows append as immutable files; downstream batch
    * operators (the whole §2 family) read the same lake. */
  def sinkToLake(finalized: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    finalized.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Streaming twin of the batch multi-scale stats (ops.Features q10):
    * per-user per-week mean/variance computed incrementally — the
    * reference re-scans the whole CDR log per window (data_process.py
    * month/week slicing); a watermark + tumbling window does it in one
    * continuous pass with map-side partial aggregation. */
  def userWindowStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "7 days"), col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("value")).as("mean_val"),
        var_pop(col("value")).as("var_val"))
      .select(col("window.start").as("w_start"), col("user_id"),
        col("n"), col("mean_val"), col("var_val"))

  /** Stream–stream interval join — the continuous twin of the batch
    * range join (ops.TimeJoins q50): each event on stream `a` joins the
    * events of stream `b` for the same user within the PRECEDING hour.
    * Both sides carry a watermark and the join condition bounds event
    * time in both directions, so Spark can size and EVICT the join
    * state — the only configuration at which an unbounded stream-stream
    * join is safe in production (state is O(users × 1h rate), not O(∞)).
    * Inputs must expose (user_id, ts, event_id, value); the right side
    * is renamed internally to keep the join condition unambiguous. */
  def intervalJoin(a: DataFrame, b: DataFrame): DataFrame = {
    val right = b.select(
      col("user_id").as("r_user_id"), col("ts").as("r_ts"),
      col("event_id").as("r_event_id"), col("value").as("r_value"))
    a.withWatermark("ts", "1 hour")
      .join(right.withWatermark("r_ts", "1 hour"),
        expr("""user_id = r_user_id AND
               |r_ts BETWEEN ts - INTERVAL 1 HOUR AND ts AND
               |event_id != r_event_id""".stripMargin))
      .select(col("user_id"), col("event_id"), col("r_event_id"),
        col("ts"), col("r_ts"), col("value"), col("r_value"))
  }

  case class Doc(doc_id: Long, ts: Timestamp, text: String, source: String)

  /** Streaming corpus-ingest gate — the continuous twin of the batch
    * curation pipeline's stateless gates (ops.Corpus q57): language ID
    * and quality score are the EXACT SAME column expressions the batch
    * operators use (they are stateless projections, so they run
    * unchanged on a stream), and exact dedup is content-hash
    * `dropDuplicatesWithinWatermark` — state bounded by the watermark
    * horizon, which is what makes dedup feasible on an unbounded crawl.
    * (Near-dup clustering is inherently cross-document/transitive and
    * stays a batch job over the landed lake — same split production
    * pipelines use.) */
  def corpusGateStream(docs: DataFrame): DataFrame =
    graft.ops.Text.withQualityParts(
        graft.ops.Text.withLangCounts(
          docs.withColumn("t", split(col("text"), " "))))
      .withColumn("lang_pred", graft.ops.Text.langPredCol)
      .withColumn("quality", graft.ops.Text.qualityCol)
      .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
      .withColumn("h", md5(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("h"))
      .select(col("doc_id"), col("ts"), col("source"),
        col("n_tok"), col("quality"))

  /** Streaming sketch dedup — MinHash-signature duplicate suppression
    * on an unbounded doc stream: the full 16-hash signature of the
    * document's distinct-trigram set (ops.Dedup's exact sketch,
    * computed as a STATELESS per-row projection — each doc arrives
    * whole, so no aggregation state) is the dedup key, with the
    * content md5 as fallback for docs too short to shingle. Any copy
    * whose shingle SET matches — boilerplate repetition, duplicated
    * paragraphs, re-crawls — collapses within the watermark horizon,
    * strictly more than exact dedup catches. Banded LSH recall
    * (Jaccard ≥ 0.5 near-dups) is transitive/cross-doc and stays a
    * batch job over the landed lake (q32/q55) — the same
    * streaming/batch split as near-dup clustering. */
  def sketchDedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("sig",
        coalesce(
          graft.ops.Dedup.signatureExpr(expr(graft.ops.Text.shinglesExpr)),
          concat(lit("md5:"), md5(col("text")))))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("sig"))
      .drop("sig")

  /** Streaming decontamination gate — the continuous twin of batch
    * q60: as documents arrive, flag any that share a verbatim
    * word-8-gram with the (static) benchmark slice. The benchmark gram
    * table is the small side by construction (eval suites are MBs,
    * crawls are TBs), so the stream–static semi-join is STATELESS —
    * each micro-batch joins against the broadcast static relation, no
    * streaming state at all; the only state is the watermark-bounded
    * doc_id dedup that collapses a contaminated doc's multiple gram
    * hits to one audit row. Emits ONLY contaminated docs (the audit
    * stream a lake monitor alerts on); the full per-doc gram census
    * stays batch (q60). */
  def decontaminateStream(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("ts"),
        explode(expr(graft.ops.Corpus.grams8Expr)).as("g8"))
      .join(benchGrams, Seq("g8"), "left_semi")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("doc_id"))
      .select(col("doc_id"), col("ts"))

  /** Streaming LM-quality scoring — the continuous twin of batch q68:
    * the unigram LM ships from the driver as a plan literal (reference-
    * slice word counts — a bounded curation artifact, the same handoff
    * pattern as the IVF centroids below), with log-probs pre-quantized
    * to batch q68's exact 6dp grid using StrictMath.log (what Spark's
    * `log` codegen calls). Each arriving doc is then scored by a
    * STATELESS projection: token log-probs accumulate as exact scaled
    * longs through array HOFs, so the emitted row is bit-identical to
    * batch q68's for the same document (StreamingSpec pins equality).
    * No streaming state at all — score and forward.
    *
    * The vocab arrives ALREADY capped: [[graft.ops.Corpus.lmVocab]]
    * collects only the top-K head by count (distributed top-K — the
    * driver and the task binary are bounded no matter the corpus) with
    * the FULL-vocab total, so capped-in words score bit-identically to
    * batch and capped-out words take batch's own OOV floor. A genuinely
    * huge LM beyond the in-plan-literal range would swap to a
    * stream–static join on the word plus a per-doc streaming
    * aggregation (stateful) — the same trade decontaminateStream
    * documents for its gram table. */
  def lmScoreStream(docs: DataFrame, vocab: graft.ops.Corpus.LmVocab): DataFrame = {
    require(vocab.counts.nonEmpty, "lmScoreStream needs a non-empty vocab")
    // the FULL-vocab total, not the capped map's sum: capped-in words
    // keep their exact batch probability c/t, capped-out words take the
    // same OOV floor batch emits for unseen words
    val t = vocab.total.toDouble
    def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val kmap = vocab.counts.map { case (w, c) => w -> q6(StrictMath.log(c / t)) }
    val kOov = q6(StrictMath.log(1.0 / t))
    val m = typedLit(kmap)
    docs
      .withColumn("ks", transform(split(col("text"), " "), w => element_at(m, w)))
      .withColumn("kq", transform(col("ks"), k => coalesce(k, lit(kOov))))
      .select(col("doc_id"), col("ts"),
        size(col("ks")).cast("long").as("n_tok"),
        size(filter(col("ks"), k => k.isNull)).cast("long").as("n_oov"),
        graft.ops.Exact.r(
          (aggregate(col("kq"), lit(0L), (a, k) => a + k).cast("double") / lit(1e6))
            / size(col("ks")), 6).as("avg_logp"),
        (array_min(col("kq")).cast("double") / lit(1e6)).as("min_logp"))
  }

  /** Streaming twin of batch q71 — DSIR domain scoring of documents as
    * they land. The ≤4096-row bucket→log-ratio table and the
    * unseen-bucket prior ship driver-side as a plan literal
    * ([[graft.ops.Corpus.dsirTable]] — the lmScoreStream trade), so
    * scoring is a stateless codegen'd projection: no state store, no
    * shuffle. Grams enumerate and md5-bucket through the IDENTICAL
    * expressions as batch, accumulate as exact scaled longs, divide
    * once at the end — bit-identical to batch q71 per doc
    * (StreamingSpec pins it row for row; a scaled-long sum k and the
    * batch DECIMAL(18,6) sum both land on the correctly-rounded double
    * of k/10⁶). Buckets NO training doc ever hit — impossible in batch,
    * expected on a live stream — score the Laplace prior (zero counts
    * on both sides), the DSIR analog of q68's OOV floor; `n_novel`
    * counts them so a drifting stream is visible. */
  def dsirScoreStream(docs: DataFrame, lw: Map[Long, Long], prior: Long): DataFrame = {
    require(lw.nonEmpty, "dsirScoreStream needs a non-empty ratio table")
    val m = typedLit(lw)
    val B = graft.ops.Corpus.DsirBuckets
    docs
      .withColumn("ks", transform(expr(graft.ops.Corpus.grams12Expr),
        g => element_at(m, graft.ops.Exact.portableHash(g, 8) % B)))
      .withColumn("s", aggregate(
        transform(col("ks"), k => coalesce(k, lit(prior))),
        lit(0L), (a, k) => a + k))
      .select(col("doc_id"), col("ts"),
        size(col("ks")).cast("long").as("n_grams"),
        size(filter(col("ks"), k => k.isNull)).cast("long").as("n_novel"),
        (col("s").cast("double") / lit(1e6)).as("log_w"),
        (col("s") > 0).as("keep"))
  }

  /** Streaming trending terms — the continuous twin of batch q56's tf
    * pass: tokenize in-stream, count term occurrences and (approximate)
    * distinct docs per tumbling window, and emit terms that cross
    * `minCount` when the watermark finalizes their window. Partial
    * aggregation runs map-side before the (window, term) shuffle and
    * state is bounded by the watermark horizon. Exact per-window top-k
    * ranking is NOT append-expressible over a streaming aggregate —
    * finalized windows land in the lake and batch q56 ranks there, the
    * same streaming/batch split as near-dup clustering. */
  def trendingTerms(docs: DataFrame, minCount: Long = 3): DataFrame =
    docs
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .groupBy(window(col("ts"), "10 minutes"), col("term"))
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n") >= minCount)
      .select(col("window.start").as("w_start"), col("term"),
        col("n"), col("n_docs"))

  case class Emb(vec_id: Long, ts: Timestamp, embedding: Array[Float])

  case class CentroidOut(cell: Int, n: Long, centroid: Array[Double])

  /** (Σ components, count) — running sufficient statistics per cell */
  private type CellState = (Array[Double], Long)

  /** Streaming IVF maintenance — the lambda-architecture complement of
    * batch q48: cell ASSIGNMENT is a stateless nearest-centroid step
    * against the trained centroids (a kB-sized table shipped in the
    * closure, exactly like a broadcast — the index keeps serving while
    * fresh vectors land), and per-cell running (Σ vector, count) state
    * emits a refreshed mean centroid every batch — the mini-batch
    * k-means update. Periodic full re-trains (q48's MLlib fit over the
    * landed lake) remain a batch job; this keeps cells from drifting
    * stale between them. State is O(cells × dim) — bounded by the
    * index size, not the stream. Typed state ops are the one place the
    * engine uses closures: streaming state transitions are inherently
    * imperative (same as sessionize). */
  def ivfUpdateStream(embs: Dataset[Emb],
      centroids: Array[Array[Float]]): Dataset[CentroidOut] = {
    import embs.sparkSession.implicits._
    def nearest(v: Array[Float]): Int =
      centroids.indices.minBy { i =>
        val c = centroids(i)
        var d = 0.0; var j = 0
        while (j < c.length) {
          val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1
        }
        d
      }
    embs
      .groupByKey(e => nearest(e.embedding))
      .flatMapGroupsWithState[CellState, CentroidOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (cell: Int, rows: Iterator[Emb], state: GroupState[CellState]) =>
          val dim = centroids.head.length
          val (sum, n0) = state.getOption.getOrElse((new Array[Double](dim), 0L))
          var n = n0
          rows.foreach { e =>
            var j = 0
            while (j < dim) { sum(j) += e.embedding(j); j += 1 }
            n += 1
          }
          state.update((sum, n))
          Iterator.single(CentroidOut(cell, n, sum.map(_ / n)))
      }
  }

  /** Event-time sessionization with custom state: a session closes when
    * 30 minutes pass without events (event-time timeout against the
    * watermark). State per user is O(1) — start/last/count/sum. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = 30 * 60 * 1000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val (start, last, n, total) = state.get
            state.remove()
            Iterator.single(SessionOut(userId, start, last, n, total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            // 1. gap-merge the batch FIRST: an out-of-order batch can
            //    contain several disjoint sessions, and two stragglers
            //    within the gap of each other must land in ONE session
            //    (exactly as batch q42 would merge them) — folding them
            //    one-by-one into the open session would emit singletons.
            var cands = List.empty[SessionState] // head = newest
            sorted.foreach { e =>
              val t = e.ts.getTime
              cands = cands match {
                case (start, last, n, total) :: rest if t - last <= gapMs =>
                  (start, math.max(last, t), n + 1, total + e.value) :: rest
                case _ => (t, t, 1L, e.value) :: cands
              }
            }
            // 2. reconcile with the open session: it is just one more
            //    candidate interval — chain-merge intervals that touch
            //    within the gap, in start order
            val all = (state.getOption.toList ++ cands.reverse)
              .sortBy(s => (s._1, s._2))
            var merged = List.empty[SessionState] // head = newest
            all.foreach { s =>
              merged = merged match {
                case (start, last, n, total) :: rest if s._1 - last <= gapMs =>
                  (start, math.max(last, s._2), n + s._3, total + s._4) :: rest
                case _ => s :: merged
              }
            }
            // 3. the newest interval stays open in state; every older
            //    one is already gap-separated from it — emit as closed
            val open = merged.head
            state.update(open)
            state.setTimeoutTimestamp(open._2 + gapMs)
            merged.tail.reverse.iterator
              .map(s => SessionOut(userId, s._1, s._2, s._3, s._4))
          }
      }
  }

  /** Streaming twin of batch q76: per-10-minute-window distinct-user
    * ESTIMATES via the same portable HLL sketch — the cardinality a
    * fraud console actually watches ("how many distinct callers this
    * window"), with state bounded at 256 registers per window instead
    * of the unbounded per-user set an exact streaming distinct needs.
    * Two CHAINED stateful aggregations (Spark 4's multi-stateful
    * append mode): registers per (window, bucket) via the associative
    * max — duplicate users can't move a max, so the no-dedup stream
    * register equals batch q76's post-dedup register — then the
    * finalized register rows roll up to the per-window estimate
    * through the SAME estimate projection the batch core uses
    * (StreamingSpec pins window-for-window equality). */
  def hllDistinctStream(events: DataFrame): DataFrame = {
    import graft.ops.Relational.{hllBucket, hllRank, hllEstimate}
    events
      .withWatermark("ts", "1 hour")
      .select(col("ts"),
        hllBucket(col("user_id").cast("string")).as("b"),
        hllRank(col("user_id").cast("string")).as("rank"))
      .groupBy(window(col("ts"), "10 minutes"), col("b"))
      .agg(max(col("rank")).as("mreg"))
      .groupBy(col("window"))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 53 - mreg)")).as("spresent"),
        count(lit(1)).as("nb"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        hllEstimate(col("spresent"), col("nb")).as("hll_est"))
  }

  case class TransitionOut(user_id: Long, cur: String, nxt: String,
    n: Long, n_total: Long, n_buffered: Int)

  /** (bridge = last finalized event, finalized pair counts, in-horizon
    * event buffer, keys ever emitted — for tombstones, total events) */
  private type TransState = (Option[(Long, Long, String)],
    Map[(String, String), Long], List[(Long, Long, String)],
    Set[(String, String)], Long)

  /** Streaming twin of batch q79 ([[graft.ops.Features.q79Transitions]]'
    * per-user pair counts): continuous first-order event-type transition
    * tracking — the burst-chain signal the fraud console watches.
    *
    * Out-of-order correctness: a late event can SPLIT a previously
    * observed transition (A→C becomes A→B + B→C), so per-user pair
    * counts are NOT monotone and the state must be able to rewrite
    * history inside the lateness horizon. State per user = an exact
    * finalized pair-count map + the ordered buffer of events still
    * inside the watermark horizon + the last finalized event as the
    * bridge into the live buffer. Each batch DROPS beyond-horizon
    * arrivals first — flatMapGroupsWithState with NoTimeout does NOT
    * filter later-than-watermark rows itself (Spark 4.1.2 applies its
    * late-row filter only under EventTimeTimeout), and an event older
    * than the horizon cannot be inserted correctly once its would-be
    * neighbors are finalized, so the explicit drop IS the watermark
    * contract — then merges survivors into the buffer (sorted by
    * (ts µs, event_id) — batch q79's exact window order), PERMANENTLY
    * folds pairs among events that aged past the watermark (no future
    * arrival can interleave below it), and emits the user's full
    * current snapshot: finalized + live pairs, with n = 0 tombstones
    * for pairs a late arrival has split away (Update-sink readers keep
    * the last row per key, so stale counts must be overwritten, not
    * orphaned).
    *
    * State is BOUNDED by the lateness horizon: the buffer holds only
    * events newer than the watermark, the count map at most |types|²
    * entries — and an event-time TIMEOUT finalizes idle users too
    * (the key wakes when the watermark passes its newest buffered
    * event and folds the whole buffer down to the compact counts +
    * bridge; without it an idle user would pin a full horizon's
    * buffer in the state store forever). The counts map itself
    * persists per user deliberately — it is the user's cumulative
    * transition signature, the same per-key persistence as any
    * Update-mode running aggregate. `maxLateness` trades memory for
    * reordering tolerance; the default tolerates unbounded disorder
    * (spec-friendly), production passes its real SLA (e.g. "7 days").
    * `n_buffered` exposes the live buffer size so the bounding is
    * observable (spec-pinned).
    *
    * After any batch split whose disorder respects `maxLateness`, the
    * final snapshot aggregates to batch q79's (cur, nxt, n) table
    * BIT-identically (StreamingSpec proves both the arbitrary-order and
    * the watermark-finalizing paths). */
  def transitionsStream(events: Dataset[Event],
      maxLateness: String = "36500 days"): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._
    // linear merge of two (t, id)-ascending lists — the buffer is a
    // suffix of the previous batch's sorted merge, so re-sorting it
    // every batch would pay O(B log B) per batch on an already-sorted B
    def mergeSorted(a: List[(Long, Long, String)],
        b: List[(Long, Long, String)]): List[(Long, Long, String)] = {
      val out = List.newBuilder[(Long, Long, String)]
      var (x, y) = (a, b)
      while (x.nonEmpty && y.nonEmpty) {
        val xh = x.head; val yh = y.head
        if (xh._1 < yh._1 || (xh._1 == yh._1 && xh._2 <= yh._2)) {
          out += xh; x = x.tail
        } else { out += yh; y = y.tail }
      }
      out ++= x; out ++= y
      out.result()
    }
    events.withWatermark("ts", maxLateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransState, TransitionOut](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[TransState]) =>
          val (bridge0, counts0, buf0, emitted0, total0) =
            state.getOption.getOrElse((None, Map.empty[(String, String), Long],
              Nil, Set.empty[(String, String)], 0L))
          // batch plans strip the no-op withWatermark, and there
          // getCurrentWatermarkMs throws — treat batch (and the
          // first-streaming-batch wm=0 sentinel) as "no horizon yet",
          // so batch runs compute the whole chain live in one pass and
          // pre-epoch (negative-µs) events are never dropped
          val (watermarked, wmMs) =
            try (true, state.getCurrentWatermarkMs())
            catch { case _: UnsupportedOperationException => (false, 0L) }
          val horizon = if (wmMs == 0L) Long.MinValue else wmMs * 1000L
          // beyond-SLA arrivals are dropped, NOT merged: their would-be
          // neighbors are already permanently folded, so inserting one
          // would record a spurious reversed-time transition (Spark's
          // own late filter fires under EventTimeTimeout, but the
          // explicit drop also covers the batch path and documents the
          // contract)
          val incoming = rows
            .map(e => (tsMicros(e.ts), e.event_id, e.event_type))
            .filter(_._1 >= horizon).toList
            .sortBy { case (t, id, _) => (t, id) }
          val merged = mergeSorted(incoming, buf0)
          // buffered events older than the watermark can never again
          // gain an earlier neighbor — fold their pairs permanently
          // (merged is sorted, so the finalized region is a prefix)
          val (fin, keep) = merged.span(_._1 < horizon)
          val finChain = bridge0.toList ++ fin
          val counts = finChain.zip(finChain.drop(1))
            .foldLeft(counts0) { case (m, (a, b)) =>
              val k = (a._3, b._3); m.updated(k, m.getOrElse(k, 0L) + 1L)
            }
          val bridge = finChain.lastOption
          // live pairs: bridge → buffer chain, recomputed every batch
          // (a late arrival may reorder them)
          val liveChain = bridge.toList ++ keep
          val live = liveChain.zip(liveChain.drop(1))
            .groupBy { case (a, b) => (a._3, b._3) }
            .map { case (k, ps) => k -> ps.size.toLong }
          val snapshot = (counts.keySet ++ live.keySet ++ emitted0).toSeq
            .map { k =>
              k -> (counts.getOrElse(k, 0L) + live.getOrElse(k, 0L))
            }
          val total = total0 + incoming.length
          // emitted = keys alive NOW: a key split away to zero gets its
          // one tombstone this batch (it is still in emitted0) and then
          // retires — storing it forever would re-emit a dead n=0 row
          // for the user's every future batch
          state.update((bridge, counts, keep,
            snapshot.filter(_._2 > 0L).map(_._1).toSet, total))
          // idle-user finalization: wake this key when the watermark
          // passes its newest buffered event, so the buffer folds down
          // to the compact (counts, bridge) even if the user never
          // sends another row — without this, an idle user pins an
          // entire horizon's buffer in the state store forever. (The
          // timestamp is strictly above the current watermark because
          // every kept event is ≥ horizon.)
          if (watermarked && keep.nonEmpty)
            state.setTimeoutTimestamp(Math.floorDiv(keep.last._1, 1000L) + 1L)
          val nBuffered = keep.length
          snapshot.iterator.map { case ((c, x), n) =>
            TransitionOut(userId, c, x, n, total, nBuffered)
          }
      }
  }

  case class BurstOut(user_id: Long, n_events: Long, mean_val: Double,
    ewma16: Double, burst: Option[Double])

  /** (top-16 recency buffer desc by (ts, event_id), all-time count,
    * all-time exact cents sum, state-format version). The version field
    * exists to BUMP the state schema: the buffer's sort key changed
    * from ms to µs, and a checkpoint written by the ms code would
    * silently mis-order the recency buffer (~1000× stale keys) if it
    * still deserialized — the extra column makes Spark's state-schema
    * compatibility check reject such a restart loudly instead. */
  private type BurstState = (List[(Long, Long, Long)], Long, Long, Long)

  /** Streaming twin of batch q77 ([[graft.ops.Features.q77EwmaBurst]]):
    * continuous fraud-onset burst scoring. State per user = the 16 most
    * recent (ts, event_id, cents) plus exact all-time count/cents-sum;
    * every batch re-emits the user's current row (Update semantics — the
    * fraud console wants the LATEST burst, not a history). Arithmetic is
    * the batch operator's exactly: integer cents·2^(16−rn) weighted sum,
    * one double division, 6dp quantization — so after any batch split
    * and any arrival order, the final row per user is BIT-IDENTICAL to
    * batch q77 over the same events (StreamingSpec proves it). */
  def ewmaBurstStream(events: Dataset[Event]): Dataset[BurstOut] = {
    import events.sparkSession.implicits._
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BurstState, BurstOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[BurstState]) =>
          val (buf0, n0, sum0, _) = state.getOption.getOrElse((Nil, 0L, 0L, 2L))
          // MICROsecond sort key ([[tsMicros]]): batch q77 orders by
          // the full TimestampType ts (µs precision), so two events
          // inside the same millisecond must still order by true ts
          // here, not fall back to event_id — getTime alone truncates
          // to ms and would break the spec-pinned bit-identity on
          // µs-grained data
          val incoming = rows.map(e => (tsMicros(e.ts), e.event_id, cents(e.value))).toList
          // recency buffer: merge, newest-first by (ts, event_id), cap 16
          val buf = (incoming ++ buf0)
            .sortBy { case (t, id, _) => (-t, -id) }.take(16)
          val n = n0 + incoming.length
          val sumC = sum0 + incoming.map(_._3).sum
          state.update((buf, n, sumC, 2L))
          val terms = buf.zipWithIndex.map { case ((_, _, c), i) =>
            (c * (1L << (15 - i)), 1L << (15 - i))
          }
          val ewmaRaw = terms.map(_._1).sum.toDouble / (100.0 * terms.map(_._2).sum)
          val meanRaw = (sumC / 100.0) / n
          Iterator.single(BurstOut(userId, n, r6(meanRaw), r6(ewmaRaw),
            if (meanRaw == 0.0) None else Some(r6(ewmaRaw / meanRaw))))
      }
  }
}
