package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gradient check for DualFit's hand-written backward through the
  * fused pass (clf softmax head + relu(t1) + two ε-residual
  * propagation rounds on a symmetric graph + t2 log-softmax): the
  * analytic gradient must match a central finite difference at every
  * one of the 50 parameters, on a graph that exercises message
  * passing both ways, an unlabeled node, a held-out node and both
  * relu regimes. The LstmFitSpec rationale: a wrong backward silently
  * fits worse heads that still pass the hash oracle. Pure JVM. */
class DualFitSpec extends AnyFunSuite {

  // deterministic pseudo-random doubles in [-a, a]
  private def det(seed: Int, a: Double)(k: Int): Double = {
    val x = (seed * 2654435761L + k * 40503L) & 0xffffffL
    (x.toDouble / 0xffffff - 0.5) * 2 * a
  }

  /** 5 nodes, path + triangle; node 3 unlabeled, node 4 held out. */
  private def data: DualFit.FitData = {
    val undirected = Seq((0, 1), (1, 2), (0, 2), (2, 3), (3, 4))
    val es = undirected.flatMap { case (a, b) => Seq(a, b) }.toArray
    val ed = undirected.flatMap { case (a, b) => Seq(b, a) }.toArray
    val degs = new Array[Double](5)
    es.foreach(degs(_) += 1)
    DualFit.FitData(
      x = Array.tabulate(5, 10)((i, j) => det(7, 1.5)(i * 10 + j)),
      y = Array(1, 0, 1, -1, 0),
      train = Array(true, true, true, false, false),
      es = es, ed = ed,
      enorm = es.zip(ed).map { case (s, t) => 1.0 / math.sqrt(degs(s) * degs(t)) })
  }

  test("fused-pass gradient matches central finite differences at all 50 params") {
    val d = data
    val p = Array.tabulate(DualFit.L.len)(det(3, 0.8))
    val grad = new Array[Double](DualFit.L.len)
    val (l0, _, _) = DualFit.step(p, d, grad)
    assert(l0.isFinite && l0 > 0.0)
    val eps = 1e-6
    var worst = 0.0
    for (k <- 0 until DualFit.L.len) {
      val pp = p.clone(); pp(k) += eps
      val pm = p.clone(); pm(k) -= eps
      val fp = DualFit.step(pp, d, new Array[Double](DualFit.L.len))._1
      val fm = DualFit.step(pm, d, new Array[Double](DualFit.L.len))._1
      val fd = (fp - fm) / (2 * eps)
      val denom = math.max(1.0, math.abs(fd) max math.abs(grad(k)))
      worst = math.max(worst, math.abs(fd - grad(k)) / denom)
    }
    assert(worst < 1e-5, s"worst relative gradient error $worst")
  }

  test("propagation couples the loss to unlabeled nodes' features (transductive)") {
    // node 3 is unlabeled and held out of the loss, but sits on the
    // path between labeled mass — its t1 input must still receive
    // gradient THROUGH the propagation (the reference's full-graph
    // forward). Verify by finite difference on node 3's feature.
    val d = data
    val p = Array.tabulate(DualFit.L.len)(det(3, 0.8))
    val eps = 1e-6
    val dPlus = d.copy(x = d.x.map(_.clone))
    dPlus.x(3)(0) += eps
    val dMinus = d.copy(x = d.x.map(_.clone))
    dMinus.x(3)(0) -= eps
    val fp = DualFit.step(p, dPlus, new Array[Double](DualFit.L.len))._1
    val fm = DualFit.step(p, dMinus, new Array[Double](DualFit.L.len))._1
    assert(math.abs(fp - fm) / (2 * eps) > 1e-6,
      "unlabeled node's feature has no influence — propagation not transductive")
  }
}
