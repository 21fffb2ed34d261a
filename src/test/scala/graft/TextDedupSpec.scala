package graft

import org.apache.spark.sql.functions._

/** Invariants for text analysis + sketch dedup (SURVEY.md §2.E). */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("q30 exact dedup: groups partition the corpus") {
    val df = ops.Text.q30DedupExact(spark, sf)
    val n = Tables.documents(spark, sf).count()
    assert(df.agg(sum("n_copies")).head().getLong(0) == n)
  }

  test("q31 jaccard pairs are canonical and within [0,1]") {
    val rows = ops.Text.q31DedupNgramJaccard(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r => val j = r.getDouble(3); j >= 0.5 && j <= 1.0 })
  }

  test("q37 lang id emits one prediction per doc from the known set") {
    val df = ops.Text.q37LangId(spark, sf)
    assert(df.count() == Tables.documents(spark, sf).count())
    val langs = df.select("lang_pred").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "und")))
  }

  test("q38 quality score within [0,1]") {
    val bad = ops.Text.q38QualityScore(spark, sf)
      .filter(col("quality") < 0 || col("quality") > 1).count()
    assert(bad == 0)
  }

  test("q40 identical text => identical fingerprint") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val sh = docs.withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 2),
          | i -> concat_ws(' ', element_at(t, i), element_at(t, cast(i+1 AS INT)),
          |   element_at(t, cast(i+2 AS INT))))""".stripMargin)).as("shingle"))
    val fp = sh.groupBy("doc_id").agg(min(xxhash64(col("shingle"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
  }

  test("minhash LSH: true duplicates always collide, bands counted") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),   // exact dup of 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val sh = docs.withColumn("t", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 2),
          | i -> concat_ws(' ', element_at(t, i), element_at(t, cast(i+1 AS INT)),
          |   element_at(t, cast(i+2 AS INT))))""".stripMargin)).as("shingle"))
    val pairs = ops.Dedup.minhashCandidates(sh, 16, 4).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined && p12.get.getLong(2) == 4L) // all bands collide
    assert(!pairs.exists(r => r.getLong(1) == 3L))
  }

  test("simhash: identical docs get identical sketch; runs on testdata") {
    val tok = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "q"))
      .toDF("doc_id", "token")
    val sig = ops.Dedup.simhash(tok).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L) && sig(1L) != sig(3L))
    assert(ops.Dedup.q33DedupSimhash(spark, sf).count() >= 0)
  }

  test("q34 top-k: k rows per query, descending cosine in [-1,1]") {
    val rows = ops.Ann.q34AnnCosineTopk(spark, sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size == 10 && perQ.values.forall(_.length == 10))
    perQ.values.foreach { rs =>
      val cs = rs.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    }
  }

  test("q35 LSH ANN: approximate top-1 never beats exact top-1") {
    val exact = ops.Ann.q34AnnCosineTopk(spark, sf)
      .filter(col("rk") === 1).select(col("qid"), col("cos"))
      .as[(Long, Double)].collect().toMap
    val approx = ops.Ann.q35AnnLsh(spark, sf)
      .filter(col("rk") === 1).select(col("qid"), col("cos"))
      .as[(Long, Double)].collect().toMap
    assert(approx.nonEmpty)
    // the bucket-restricted best can at most MATCH the global best; a
    // cosine above it means the LSH path scores pairs differently
    approx.foreach { case (q, c) =>
      assert(c <= exact(q) + 1e-9, s"query $q: lsh cos $c > exact ${exact(q)}")
    }
  }

  test("q48 IVF ANN: high recall@10 vs brute force, never beats exact") {
    val exact = ops.Ann.q34AnnCosineTopk(spark, sf)
      .select("qid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    def meanRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val ivf = df.select("qid", "cid").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
      assert(ivf.nonEmpty)
      val recalls = exact.keys.toSeq.map { q =>
        val hit = ivf.getOrElse(q, Set.empty[Long]) & exact(q)
        hit.size.toDouble / exact(q).size
      }
      recalls.sum / recalls.size
    }
    // nprobe=3 of k=8 cells must recover most true neighbors on
    // clustered synthetic embeddings — both for the live MLlib trainer
    // and for the frozen-centroid serving path the driver hash-oracles
    // (frozen centroids come from sf0.01; this corpus is sf0.001, so
    // the gate also proves the index tolerates serving fresher data
    // than it was trained on)
    val trained = meanRecall(ops.Ann.q48AnnIvfTrained(spark, sf))
    assert(trained >= 0.5, s"trained mean recall@10 $trained")
    val frozen = meanRecall(ops.Ann.q48AnnIvf(spark, sf))
    assert(frozen >= 0.5, s"frozen-probe mean recall@10 $frozen")
  }

  test("q55 dedup clusters: exactly one keeper per cluster, keeper is min doc_id") {
    val rows = ops.Dedup.q55DedupClusters(spark, sf).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    assert(byCluster.nonEmpty) // sf0.001 corpus contains near-dups
    byCluster.foreach { case (c, rs) =>
      assert(rs.count(_.getAs[Boolean]("keep")) == 1, s"cluster $c keepers != 1")
      val ids = rs.map(_.getAs[Long]("doc_id"))
      assert(rs.filter(_.getAs[Boolean]("keep")).head.getAs[Long]("doc_id") == ids.min)
      assert(c == ids.min) // component label IS the canonical id
    }
  }

  test("q55 clusters equal a union-find transitive closure of the ≥0.5 pairs") {
    val pairs = ops.Dedup.q32DedupMinhash(spark, sf)
      .filter(col("jaccard") >= 0.5).select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
      .map(k => k -> find(k)).toMap
    val got = ops.Dedup.q55DedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("q36 embedding near-dups are canonical pairs above the threshold") {
    val rows = ops.Ann.q36DedupEmbedding(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(3) >= 0.4))
  }

  test("q70 PII scrub core: detection, redaction, passthrough and idempotence") {
    val cases = Seq(
      (1L, "write to alice.b+spam@corp.example.org or bob@ex.io today"),
      (2L, "server 192.168.001.7 then call +44 (0) 20-7946-0958 now"),
      (3L, "no pii here just words and numbers like 42 and 1-2"),
      (4L, "double email x@y.com x@y.com and ip 10.0.0.1 tail"),
      (5L, "")
    ).toDF("doc_id", "t")
    val out = ops.Text.withPiiScrub(cases, "t").orderBy("doc_id").collect()
    def row(i: Long) = out.find(_.getLong(0) == i).get
    assert(row(1).getAs[Long]("n_emails") == 2 && row(1).getAs[String]("email") == "alice.b+spam@corp.example.org")
    assert(row(1).getAs[String]("redacted") == "write to <EMAIL> or <EMAIL> today")
    assert(row(2).getAs[Long]("n_ips") == 1 && row(2).getAs[Long]("n_phones") == 1)
    assert(row(2).getAs[String]("redacted") == "server <IP> then call <PHONE> now")
    assert(row(3).getAs[Long]("n_emails") + row(3).getAs[Long]("n_ips") +
      row(3).getAs[Long]("n_phones") == 0)
    assert(row(3).getAs[String]("redacted") == row(3).getAs[String]("t")) // untouched
    assert(row(4).getAs[Long]("n_emails") == 2 && row(4).getAs[Long]("n_ips") == 1)
    assert(row(5).getAs[String]("redacted") == "")
    // idempotence: markers contain no scrubbable content, so a second
    // pass is a no-op — the property that makes re-runs safe
    val again = ops.Text.withPiiScrub(
      ops.Text.withPiiScrub(cases, "t").select(col("doc_id"), col("redacted").as("t")), "t")
      .orderBy("doc_id").collect()
    out.zip(again).foreach { case (a, b) =>
      assert(a.getAs[String]("redacted") == b.getAs[String]("redacted"))
    }
  }

  test("q72 Gopher rules core: each rule flips on exactly its crafted document") {
    val base = "the a of and " + Seq.fill(56)("word").mkString(" ")
    val cases = Seq(
      (1L, base),                                        // all rules pass
      (2L, "the a of and word"),                         // 5 words < 50
      (3L, base + " # # # # # # # #"),                   // 8/68 > 0.1 symbols
      (4L, base + Seq.fill(10)("\n- x").mkString),       // 10/11 > 0.9 bullets
      (5L, base + "\nhm..."),                            // 1/2 > 0.3 ellipsis lines
      (6L, base + Seq.fill(20)(" 9").mkString),          // 60/80 < 0.8 alpha
      (7L, Seq.fill(60)("word").mkString(" ")),          // 0 stopwords
      (8L, "the a of and " + Seq.fill(56)("aa").mkString(" ")) // mean wlen < 3
    ).toDF("doc_id", "t")
    val out = ops.Text.withGopherRules(cases, "t").orderBy("doc_id").collect()
    def row(i: Long) = out.find(_.getLong(0) == i).get
    assert(row(1).getAs[Boolean]("gopher_pass"))
    assert((2L to 8L).forall(!row(_).getAs[Boolean]("gopher_pass")))
    // the failing metric is the intended one, and only that one
    assert(row(2).getAs[Long]("n_words") == 5L)
    assert(row(3).getAs[Double]("symbol_ratio") > 0.1 &&
      row(3).getAs[Double]("frac_alpha") >= 0.8)
    assert(row(4).getAs[Double]("frac_bullet") > 0.9)
    assert(row(5).getAs[Double]("frac_ellipsis") > 0.3)
    assert(row(6).getAs[Double]("frac_alpha") < 0.8 &&
      row(6).getAs[Double]("symbol_ratio") == 0.0)
    assert(row(7).getAs[Long]("n_stop") == 0L &&
      row(7).getAs[Long]("n_words") == 60L)
    assert(row(8).getAs[Double]("mean_wlen") < 3.0)
    // exact metric spot-check on the passing doc
    assert(row(1).getAs[Long]("n_words") == 60L)
    assert(row(1).getAs[Long]("n_stop") == 4L)
    assert(row(1).getAs[Double]("frac_alpha") == 1.0)
    assert(row(1).getAs[Double]("mean_wlen") ==
      math.floor((3 + 1 + 2 + 3 + 56 * 4) / 60.0 * 1e6 + 0.5) / 1e6)
  }
}
