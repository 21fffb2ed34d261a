package graft

/** Plain-Scala reference of q90's LSTM cell — independent of the SQL
  * expression text AND of the packed-double state encoding, shared by
  * FeaturesSpec (fixed cases) and PropertySpec (random sequences). */
object Q90Ref {
  def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
  private def sig(z: Double) = r6(1.0 / (1.0 + math.exp(-z)))
  private def th(z: Double) = r6(1.0 - 2.0 / (math.exp(2.0 * z) + 1.0))

  def cell(x: Double, h: Double, c: Double): (Double, Double) = {
    val i = sig(0.5 * x + 0.25 * h + 0.0625)
    val f = sig(0.25 * x + 0.25 * h + 0.5)
    val g = th(0.5 * x + 0.25 * h)
    val o = sig(0.5 * x + 0.25 * h - 0.0625)
    val cN = math.floor(math.max(math.min(f * c + i * g, 4.0), -4.0) * 1e6 + 0.5) / 1e6
    val hN = math.floor(o * th(cN) * 1e6 + 0.5) / 1e6
    (hN, cN)
  }

  /** x for a tensor row where n_events/mean_val vary and every other
    * slot is 0.125 — the same left-associated weight order as the
    * production projection. */
  def x(nEvents: Long, meanVal: Double): Double =
    r6(ops.Features.q87FeatureAttn.foldLeft(0.0) {
      case (acc, ("n_events", w)) => acc + w * nEvents
      case (acc, ("mean_val", w)) => acc + w * meanVal
      case (acc, (_, w)) => acc + w * 0.125
    })

  def fold(xs: Seq[Double]): (Double, Double) =
    xs.foldLeft((0.0, 0.0)) { case ((h, c), x) => cell(x, h, c) }
}
