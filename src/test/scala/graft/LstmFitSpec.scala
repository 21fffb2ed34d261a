package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gradient check for LstmFit's hand-written BPTT: the analytic
  * gradient must match a central finite difference of the loss at
  * every parameter, for H=1 and H=2, on sequences that exercise both
  * the interior (clip inactive, pass-through gradient) and a
  * clip-saturated cell (gradient zero through the clipped step). A
  * wrong backward would not crash the trainer — it would silently fit
  * worse weights that still pass the hash oracle, which is why the
  * check lives here and not in the oracle gate. Pure JVM, no Spark. */
class LstmFitSpec extends AnyFunSuite {

  private def loss(L: LstmFit.Layout, p: Array[Double],
      data: Seq[(Array[Double], Double)]): Double =
    data.map { case (xs, y) =>
      LstmFit.bptt(L, p, xs, y, new Array[Double](L.len))._1
    }.sum

  private def checkGrad(h: Int, data: Seq[(Array[Double], Double)],
      init: Int => Double): Double = {
    val L = new LstmFit.Layout(h)
    val p = Array.tabulate(L.len)(init)
    val grad = new Array[Double](L.len)
    data.foreach { case (xs, y) => LstmFit.bptt(L, p, xs, y, grad) }
    val eps = 1e-6
    var worst = 0.0
    for (k <- 0 until L.len) {
      val pp = p.clone(); pp(k) += eps
      val pm = p.clone(); pm(k) -= eps
      val fd = (loss(L, pp, data) - loss(L, pm, data)) / (2 * eps)
      val denom = math.max(1.0, math.abs(fd) max math.abs(grad(k)))
      worst = math.max(worst, math.abs(fd - grad(k)) / denom)
    }
    worst
  }

  // deterministic pseudo-random doubles in [-a, a]
  private def det(seed: Int, a: Double)(k: Int): Double = {
    val x = (seed * 2654435761L + k * 40503L) & 0xffffffL
    (x.toDouble / 0xffffff - 0.5) * 2 * a
  }

  test("BPTT gradient matches central finite differences (H=1 and H=2)") {
    val seqs = Seq(
      (Array(0.3, -0.7, 1.2, 0.05), 1.0),
      (Array(-1.5, 0.0, 0.8), 0.0),
      (Array(0.01), 1.0)) // length-1: the readout-only boundary
    for (h <- Seq(1, 2)) {
      val worst = checkGrad(h, seqs, det(h, 0.6))
      assert(worst < 1e-5, s"H=$h worst relative gradient error $worst")
    }
  }

  test("clip-saturated steps pass zero gradient through the cell state") {
    // big positive weights + a long positive input run drive cRaw past
    // +4: the clip must zero dC through those steps (a pass-through
    // backward here would diverge from the true loss surface, which
    // the finite difference measures directly)
    val seqs = Seq((Array.fill(12)(3.0), 1.0), (Array.fill(8)(2.5), 0.0))
    val L = new LstmFit.Layout(1)
    // confirm the clip actually engages under these params
    val p = Array.tabulate(L.len)(k => 0.9 - 0.1 * (k % 3))
    val (l0, _) = LstmFit.bptt(L, p, seqs.head._1, 1.0, new Array[Double](L.len))
    assert(l0.isFinite)
    val worst = checkGrad(1, seqs, k => 0.9 - 0.1 * (k % 3))
    assert(worst < 1e-5, s"clipped-path worst relative gradient error $worst")
  }
}
