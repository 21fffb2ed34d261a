package graft

import org.apache.spark.sql.functions._

/** Invariants for the deterministic samplers — q69's temperature mixing
  * math replayed independently driver-side, and the properties the
  * operator exists for (budget respected, rare sources upweighted). */
class SamplingSpec extends SparkSpec {

  test("q69 mix sample: thresholds replay exactly; budget and temperature properties hold") {
    val rows = ops.Sampling.q69MixSample(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())

    // independent replay of the whole rate computation from raw data
    val masses = Tables.documents(spark, sf)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rs) => s -> rs.map(_.getLong(1)).sum }
    val rScaled = masses.map { case (s, n) =>
      s -> math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong } // 6dp decimal, scaled
    val rsum = rScaled.values.sum // exact decimal sum, scaled by 1e6
    val nTotal = masses.values.sum
    val expThresh = masses.map { case (s, n) =>
      val frac = math.min(1.0,
        (rScaled(s) / 1e6 / (rsum / 1e6)) * (nTotal / 2.0) / n)
      s -> math.floor(frac * 1000000.0).toLong
    }
    rows.foreach { r =>
      val (src, thresh) = (r.getString(1), r.getLong(3))
      assert(thresh == expThresh(src), s"$src: $thresh != ${expThresh(src)}")
      // the keep decision is the LCG bucket vs that threshold
      val id = r.getLong(0)
      val b = ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L % 1000000L
      assert(r.getBoolean(4) == (b < thresh), r)
    }

    // kept token mass lands near the budget (N/2) — hash sampling is
    // uniform, so a wide tolerance band suffices at any SF
    val keptTokens = rows.filter(_.getBoolean(4)).map(_.getLong(2)).sum
    val budget = nTotal / 2.0
    assert(keptTokens > budget * 0.7 && keptTokens < budget * 1.3,
      s"kept $keptTokens vs budget $budget")

    // temperature α=0.5 upweights rare sources: keep fractions must be
    // non-increasing in source mass (strictly higher for a 4×-smaller
    // source unless both are capped at 1)
    val bySrc = rows.groupBy(_.getString(1))
      .map { case (s, rs) => (masses(s), rs.head.getLong(3)) }.toSeq.sortBy(_._1)
    bySrc.sliding(2).foreach {
      case Seq((nSmall, tSmall), (nBig, tBig)) =>
        assert(tSmall >= tBig,
          s"source mass $nSmall thresh $tSmall < mass $nBig thresh $tBig")
      case _ =>
    }
  }
}
