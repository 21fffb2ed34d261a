package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** Connected components vs a union-find reference. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("label propagation equals union-find on random graphs") {
    val rnd = new Random(13)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(edges)
    val got = ops.Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(5)}")
  }

  test("deep chain converges via pointer jumping (O(log diameter))") {
    // a 200-node path has diameter 199: pure hash-min would need 199
    // rounds and fragment at the 30-round cap; pointer jumping must not
    val edges = (1L until 200L).map(i => (i, i + 1))
    val got = ops.Components.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    assert(got.values.forall(_ == 1L), s"fragmented: ${got.values.toSet}")
  }

  test("large-star/small-star contraction equals hash-min CC on random graphs") {
    val rnd = new Random(29)
    val edges = (1 to 150).map(_ =>
      (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val expected = unionFind(edges)
    val got = ops.Components.connectedComponentsContract(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"diff=${(got.toSet diff expected.toSet).take(5)}")
  }

  test("contraction handles a deep chain and a hub star in few rounds") {
    // 120-node path (high diameter) plus a hub fanning to 40 leaves
    // (extreme skew): both converge inside the default cap
    val chain = (1L until 120L).map(i => (i, i + 1))
    val hub = (1L to 40L).map(i => (1000L, 1000L + i))
    val got = ops.Components
      .connectedComponentsContract((chain ++ hub).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 161)
    assert((1L to 120L).forall(got(_) == 1L))
    assert((1000L to 1040L).forall(got(_) == 1000L))
  }

  test("auto strategy picks a correct algorithm at both ends of the heuristic") {
    val edges = ((1L until 60L).map(i => (i, i + 1)) ++
      (1L to 30L).map(i => (500L, 500L + i))).toDF("src", "dst")
    val want = ops.Components.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hubDegreeLimit high → hash-min path; limit 1 → every vertex looks
    // like a hub → contraction path. Labels must agree either way.
    for (limit <- Seq(Long.MaxValue, 1L)) {
      val got = ops.Components.connectedComponentsAuto(edges, hubDegreeLimit = limit)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"limit=$limit")
    }
  }

  test("q47 components: labels are component minima, sizes consistent") {
    val df = ops.Components.q47ConnectedComponents(spark, sf).cache()
    assert(df.filter(col("comp") > col("node")).count() == 0)
    val bad = df.groupBy("comp").agg(count(lit(1)).as("n"),
        max("comp_size").as("sz"))
      .filter(col("n") =!= col("sz")).count()
    assert(bad == 0)
    df.unpersist()
  }
}
