package graft

import org.apache.spark.sql.functions._

/** Invariants for the corpus-level operators (tf-idf, end-to-end
  * curation pipeline). */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("q56 tf-idf: ranks are 1..k per doc, scores descend, ubiquitous terms score low") {
    val rows = ops.Corpus.q56TfidfTopTerms(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rs) =>
      val ranks = rs.map(_.getLong(5)).sorted.toSeq
      assert(ranks == (1L to ranks.size), s"doc $doc ranks $ranks")
      val scores = rs.sortBy(_.getLong(5)).map(_.getDouble(4)).toSeq
      assert(scores == scores.sortBy(-_), s"doc $doc not descending: $scores")
    }
    // a term present in EVERY doc has idf ratio N/df = 1 — it can only
    // win a top-5 slot over terms that are themselves near-ubiquitous
    val n = Tables.documents(spark, sf).count()
    val tok = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val everywhere = tok.distinct().groupBy("term").count()
      .filter(col("count") === n).select("term").as[String].collect().toSet
    if (everywhere.nonEmpty) {
      val topRank1 = rows.filter(_.getLong(5) == 1L).map(_.getString(1))
      assert(topRank1.count(everywhere) < topRank1.length,
        "every doc's top term is a corpus-wide stopword — idf is not discriminating")
    }
  }

  test("q57 pipeline: weights sum to 1, kept docs pass every gate") {
    val out = ops.Corpus.q57CorpusPipeline(spark, sf).collect()
    assert(out.nonEmpty)
    val wsum = out.map(_.getDouble(3)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // per-source totals are bounded by the raw corpus per-source counts
    val raw = Tables.documents(spark, sf).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    out.foreach { r =>
      assert(r.getLong(1) <= raw(r.getString(0)),
        s"source ${r.getString(0)} kept more docs than exist")
    }
  }

  test("q60 decontamination: benchmark docs excluded, flags are hit-consistent") {
    val rows = ops.Corpus.q60Decontaminate(spark, sf).collect()
    assert(rows.nonEmpty)
    // no benchmark doc leaks into the audited corpus
    assert(rows.forall(_.getAs[Long]("doc_id") % 23 != 0))
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits <= r.getAs[Long]("n_grams"))
      assert(r.getAs[Boolean]("contaminated") == (hits > 0))
    }
  }

  test("q61 repetition ratio: bounds, zero for short docs, flags thresholded") {
    val rows = ops.Corpus.q61RepetitionRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rep_ratio")
      assert(ratio >= 0.0 && ratio < 1.0, r)
      assert(r.getAs[Long]("n_distinct") <= math.max(r.getAs[Long]("n_total"), 0L))
      if (r.getAs[Long]("n_total") == 0) assert(ratio == 0.0)
      assert(r.getAs[Boolean]("flagged") == (ratio > 0.3))
    }
    // the synthetic corpus repeats boilerplate: some doc must repeat a trigram
    assert(rows.exists(_.getAs[Double]("rep_ratio") > 0.0))
  }

  test("q62 packing: offsets are the exact running sum, chunk spans consistent") {
    val rows = ops.Corpus.q62PackChunks(spark, sf).collect()
    // output is doc_id-ordered; each start_off must equal the running sum
    var run = 0L
    rows.foreach { r =>
      val (nTok, startOff) = (r.getLong(1), r.getLong(2))
      assert(startOff == run, s"doc ${r.getLong(0)}: off $startOff != running $run")
      val chunkId = r.getLong(3)
      val nChunks = r.getLong(4)
      val lastChunk = (startOff + nTok - 1) / 2048
      assert(chunkId == startOff / 2048)
      assert(nChunks == lastChunk - chunkId + 1)
      assert(r.getBoolean(5) == (nChunks > 1))
      run += nTok
    }
    assert(rows.nonEmpty)
  }

  test("q63 line dedup: one row per doc, counts consistent, boiler total matches hot-line mass") {
    val rows = ops.Corpus.q63LineDedup(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val (nLines, nBoiler) = (r.getAs[Long]("n_lines"), r.getAs[Long]("n_boiler"))
      assert(nLines > 0, r)
      assert(nBoiler >= 0 && nBoiler <= nLines, r)
      // a kept line carries at most lineLen tokens
      assert(r.getAs[Long]("n_kept_tokens") <= (nLines - nBoiler) * 10, r)
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0, r)
    }
    // cross-check the flagged mass independently: total boiler instances
    // must equal the sum of df over lines with df > 2
    val lines = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        """transform(sequence(0, cast(ceil(size(w) / 10.0) as int) - 1),
          | i -> concat_ws(' ', slice(w, i * 10 + 1, 10)))""".stripMargin)).as("line"))
    val hotMass = lines.groupBy("line").count()
      .filter(col("count") > 2)
      .agg(coalesce(sum("count"), lit(0L))).as[Long].head()
    assert(rows.map(_.getAs[Long]("n_boiler")).sum == hotMass)
    // the synthetic corpus contains duplicated boilerplate: some line must repeat
    assert(hotMass > 0, "test corpus has no repeated lines — invariant check is vacuous")
  }

  test("q68 LM quality: one row per doc, scores bounded, independent per-doc replay") {
    val rows = ops.Corpus.q68LmQuality(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_logp") < 0.0, r)
      assert(r.getAs[Double]("min_logp") <= r.getAs[Double]("avg_logp") + 1e-9, r)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tok"), r)
    }
    // independent replay: rebuild the reference-slice LM driver-side with
    // StrictMath.log (what Spark's log codegen calls) and re-score one doc
    val refToks = Tables.documents(spark, sf).filter(col("doc_id") % 7 === 0)
      .select(explode(split(col("text"), " ")).as("w")).as[String].collect()
    val c = refToks.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val t = refToks.length.toDouble
    def q(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong // Exact.r scaled
    val lp = c.map { case (w, n) => w -> q(StrictMath.log(n / t)) }
    val doc = Tables.documents(spark, sf).orderBy(col("doc_id"))
      .select(col("doc_id"), col("text")).head()
    val toks = doc.getString(1).split(" ")
    val sumScaled = toks.map(w => lp(w)).sum // all in-vocab on generated data
    val expAvg = math.floor(sumScaled / 1e6 / toks.length * 1e6 + 0.5) / 1e6
    val got = rows.find(_.getLong(0) == doc.getLong(0)).get
    assert(got.getAs[Long]("n_tok") == toks.length)
    assert(got.getAs[Long]("n_oov") == 0L)
    assert(got.getAs[Double]("avg_logp") == expAvg,
      s"avg_logp ${got.getAs[Double]("avg_logp")} != replayed $expAvg")
    assert(got.getAs[Double]("min_logp") == toks.map(w => lp(w)).min / 1e6)
  }

  test("q74 BM25: full driver-side replay, idf boundary margins, rank contract") {
    val rows = ops.Corpus.q74Bm25TopK(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val q = ops.Corpus.bm25Query.toSet
    val dl = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val nd = docs.length.toLong
    val td = dl.values.sum
    val avgdl = td * 1.0 / nd
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").filter(q).groupBy(identity)
        .map { case (w, ws) => w -> ws.length.toLong }
    }.toMap
    val dfc = q.map(t => t -> docs.count { case (id, _) => tf(id).contains(t) }.toLong).toMap
    // idf = 6dp-quantized ln; flake window is ~1e-9 ulp — require the
    // measured distance from every rounding boundary to dwarf it
    val idf = dfc.map { case (t, df) =>
      val y = StrictMath.log((nd - df + 0.5) / (df + 0.5) + 1.0) * 1e6
      val frac = y - math.floor(y)
      assert(math.abs(frac - 0.5) > 1e-3, s"idf($t) on a 6dp boundary: $y")
      t -> math.floor(y + 0.5) / 1e6
    }
    def q12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val scores = docs.flatMap { case (id, _) =>
      val terms = tf(id)
      if (terms.isEmpty) None
      else Some(id -> math.floor(terms.map { case (t, f) =>
        q12(idf(t) * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)))
      }.sum.toDouble * 1e6 + 0.5) / 1e6)
    }
    val expected = scores.sortBy { case (id, s) => (-s, id) }
      .take(ops.Corpus.bm25TopK)
    assert(rows.length == math.min(ops.Corpus.bm25TopK, scores.length))
    rows.zip(expected).zipWithIndex.foreach { case ((r, (id, s)), i) =>
      assert(r.getLong(0) == id, s"rank ${i + 1}: doc ${r.getLong(0)} != $id")
      assert(r.getDouble(1) == s, s"doc $id score ${r.getDouble(1)} != $s")
      assert(r.getLong(2) == i + 1L, s"rank column at $i")
    }
    // scores weakly descend down the ranking
    val ss = rows.map(_.getDouble(1)).toSeq
    assert(ss == ss.sortBy(-(_: Double)))
  }

  test("q81 PMI: full driver-side replay, ln boundary margins, rank contract") {
    val rows = ops.Corpus.q81PmiBigrams(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("text")).as[String].collect()
    val pairs = docs.flatMap(_.split(" ", -1).sliding(2).collect {
      case Array(a, b) => (a, b)
    })
    val cab = pairs.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= ops.Corpus.pmiMinCount)
    val uni = (pairs.map(_._1) ++ pairs.map(_._2)).groupBy(identity)
      .map { case (w, xs) => w -> xs.length.toLong }
    val n = pairs.length.toLong
    val scored = cab.map { case ((a, b), c) =>
      val y = StrictMath.log(c * 1.0 * n / (uni(a) * 1.0 * uni(b))) * 1e6
      val frac = y - math.floor(y)
      // vocab² pairs sit denser near boundaries than q68's unigram
      // vocab (closest measured: 3.6e-4) — still ≥10⁴× the ~1e-9 ulp
      // disagreement scale, so the gate is safe with margin to spare
      assert(math.abs(frac - 0.5) > 1e-5, s"pmi($a,$b) on a 6dp boundary: $y")
      (a, b, c, math.floor(y + 0.5) / 1e6)
    }.toSeq
    val expected = scored.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }
      .take(ops.Corpus.pmiTopK)
    assert(rows.length == math.min(ops.Corpus.pmiTopK, scored.size))
    rows.zip(expected).zipWithIndex.foreach { case ((r, (a, b, c, pmi)), i) =>
      assert(r.getString(0) == a && r.getString(1) == b, s"rank ${i + 1} pair")
      assert(r.getLong(2) == c && r.getDouble(3) == pmi, s"rank ${i + 1} values")
      assert(r.getLong(4) == i + 1L)
    }
  }

  test("q82 source KL: non-negative, full driver-side replay with margin audit") {
    val rows = ops.Corpus.q82SourceKl(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).as[(String, String)].collect()
    val sw = docs.flatMap { case (s, t) => t.split(" ", -1).map(w => (s, w)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val cw = sw.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val ts = sw.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val t = cw.values.sum
    def q12(x: Double) = BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val expected = ts.keys.map { s =>
      val terms = sw.collect { case ((`s`, w), c) =>
        val y = StrictMath.log(c * 1.0 * t / (ts(s) * 1.0 * cw(w))) * 1e6
        val frac = y - math.floor(y)
        assert(math.abs(frac - 0.5) > 1e-5, s"kl term($s,$w) on a boundary: $y")
        q12((c * 1.0 / ts(s)) * (math.floor(y + 0.5) / 1e6))
      }
      s -> math.floor(terms.sum.toDouble * 1e6 + 0.5) / 1e6
    }.toMap
    rows.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == ts(s), s"$s n_tokens")
      assert(r.getDouble(2) == expected(s), s"$s kl ${r.getDouble(2)} != ${expected(s)}")
      // KL ≥ 0 up to the 6dp per-term quantization (vocab-sized slack)
      assert(r.getDouble(2) > -1e-3, s"$s kl negative beyond quantization slack")
    }
  }

  test("q78 dup spans: full driver-side replay of the span algebra") {
    val rows = ops.Corpus.q78DupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // corpus-wide 8-gram occurrence counts (positions kept, stride 1)
    val posGrams = docs.map { case (id, t) =>
      val tok = t.split(" ", -1)
      id -> (if (tok.length >= 8)
        (0 to tok.length - 8).map(i => (i + 1L, tok.slice(i, i + 8).mkString(" ")))
      else Seq.empty)
    }.toMap
    val occ = posGrams.values.flatten.groupBy(_._2).map { case (g, xs) => g -> xs.size }
    assert(occ.values.exists(_ >= 2), "corpus must contain repeated 8-grams")
    docs.foreach { case (id, t) =>
      val nTok = t.split(" ", -1).length.toLong
      val flagged = posGrams(id).collect { case (p, g) if occ(g) >= 2 => p }.sorted
      // merge positions ≤8 apart into spans of coverage [p, p+7]
      val spans = flagged.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, p) if p - e <= 8 => (s, math.max(e, p)) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => e + 7 - s + 1 }
      val r = rows(id)
      assert(r.getLong(1) == nTok, s"doc $id n_tok")
      assert(r.getLong(2) == spans.length.toLong, s"doc $id n_spans")
      assert(r.getLong(3) == spans.sum, s"doc $id dup_tokens")
      assert(r.getLong(4) == (if (spans.isEmpty) 0L else spans.max), s"doc $id longest")
      assert(r.getDouble(5) ==
        math.floor(spans.sum * 1.0 / nTok * 1e6 + 0.5) / 1e6, s"doc $id ratio")
      // coverage can never exceed the doc
      assert(r.getLong(3) <= nTok)
    }
  }

  test("q71 DSIR: full driver-side StrictMath replay, boundary margins, keep consistency") {
    val rows = ops.Corpus.q71DsirWeight(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(rows.length == docs.count(_._1 % 7 != 0))
    // replay the WHOLE pipeline driver-side: same md5 buckets, same
    // Laplace smoothing, StrictMath.log (what Spark's log calls), same
    // 6dp quantization — every row must match exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Long = {
      val hex = md.digest(g.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % ops.Corpus.DsirBuckets
    }
    def grams(s: String): Array[Long] = {
      val t = s.split(" ")
      (t ++ t.sliding(2).filter(_.length == 2).map(_.mkString(" "))).map(bucket)
    }
    val B = ops.Corpus.DsirBuckets
    val tc = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    val rc = collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    docs.foreach { case (id, txt) =>
      val m = if (id % 7 == 0) tc else rc
      grams(txt).foreach(b => m(b) += 1)
    }
    val (tt, rr) = (tc.values.sum.toDouble, rc.values.sum.toDouble)
    var minMargin = Double.MaxValue
    val lw = (tc.keySet ++ rc.keySet).map { b =>
      val x = (StrictMath.log((tc(b) + 1.0) / (tt + B)) -
        StrictMath.log((rc(b) + 1.0) / (rr + B))) * 1e6
      minMargin = math.min(minMargin, math.abs(x - math.floor(x) - 0.5))
      b -> math.floor(x + 0.5).toLong
    }.toMap
    // every bucket's pre-quantization value must sit far (>=1e-8 of a
    // grid step) from the floor(x+0.5) discontinuity — the ulp-scale
    // cross-engine ln discrepancy is ~1e-9, so the oracle can't flake
    assert(minMargin > 1e-8, s"quantization margin $minMargin too tight")
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    docs.filter(_._1 % 7 != 0).foreach { case (id, txt) =>
      val gs = grams(txt)
      val s = gs.map(lw).sum
      val r = byId(id)
      assert(r.getAs[Long]("n_grams") == gs.length, s"doc $id n_grams")
      assert(r.getAs[Double]("log_w") == s / 1e6,
        s"doc $id log_w ${r.getAs[Double]("log_w")} != replayed ${s / 1e6}")
      assert(r.getAs[Boolean]("keep") == (s > 0), s"doc $id keep")
    }
  }

  test("q71 DSIR core: target-like raw docs score above off-distribution ones") {
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha"), // target (0 % 7 == 0)
      (7L, "alpha beta alpha"),            // target
      (1L, "alpha beta alpha beta"),       // raw, target-like
      (2L, "zork quux blorb gnarf"),       // raw, off-distribution
      (3L, "alpha beta zork quux")         // raw, mixed
    ).toDF("doc_id", "text")
    val out = ops.Corpus.dsirWeight(docs, col("doc_id") % 7 === 0)
      .orderBy("doc_id").collect()
    assert(out.length == 3) // only raw docs are scored
    def w(id: Long) = out.find(_.getLong(0) == id).get.getAs[Double]("log_w")
    assert(w(1L) > 0, "target-like doc must score positive (kept)")
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"ordering violated: ${w(1L)} / ${w(3L)} / ${w(2L)}")
    assert(w(2L) < 0, "off-distribution doc must score negative (dropped)")
    assert(out.find(_.getLong(0) == 1L).get.getAs[Long]("n_grams") == 7) // 4 uni + 3 bi
  }

  test("q68 OOV branch: an unseen word falls back to the 1/t floor") {
    val docs = Seq(
      (0L, "a a b", "en", "s0", 5L),  // reference slice (0 % 7 == 0)
      (7L, "a b b", "en", "s0", 5L),  // reference slice
      (3L, "a zzz b", "en", "s0", 7L) // non-reference; zzz is OOV
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = ops.Corpus.lmQuality(docs, col("doc_id") % 7 === 0)
      .orderBy(col("doc_id")).collect()
    assert(out.length == 3)
    // vocab: a→3, b→3, t=6; lp(a)=lp(b)=r6(ln 1/2); oov floor=r6(ln 1/6)
    def q(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val lpA = q(StrictMath.log(3.0 / 6))
    val lpOov = q(StrictMath.log(1.0 / 6))
    val d3 = out.find(_.getLong(0) == 3L).get
    assert(d3.getAs[Long]("n_oov") == 1L)
    assert(d3.getAs[Double]("min_logp") == lpOov / 1e6)
    val expAvg = math.floor((2 * lpA + lpOov) / 1e6 / 3 * 1e6 + 0.5) / 1e6
    assert(d3.getAs[Double]("avg_logp") == expAvg)
    // the OOV doc scores strictly below its all-in-vocab twin would —
    // the filter signal the operator exists for
    val d7 = out.find(_.getLong(0) == 7L).get
    assert(d3.getAs[Double]("avg_logp") < d7.getAs[Double]("avg_logp"))
    assert(d7.getAs[Long]("n_oov") == 0L)
  }
}
