package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over the link-similarity network — the fraud-
  * ring detection step the reference's buildLSN output feeds (clusters
  * of users sharing ≥k call contacts ARE the suspected rings; the
  * reference leaves clustering to the GNN, production systems run CC).
  *
  * Algorithm: hash-min label propagation — every vertex starts with its
  * own id, each round adopts the min label in its closed neighborhood,
  * until a fixed point. Each round is one join + one groupBy (both
  * shuffles on the vertex id); rounds needed = graph diameter, and the
  * driver loop only orchestrates — all data stays distributed. This is
  * the standard large-graph CC (GraphX/GraphFrames use the same
  * fixpoint); at 100 TB you'd add large-star/small-star contraction to
  * cut rounds on high-diameter graphs.
  */
object Components {

  /** CC labels for an undirected edge list (src, dst). Returns
    * (node, component) with component = min vertex id in the component.
    *
    * Convergence: each round is a neighbor-min pass PLUS a pointer-jump
    * (comp := label(comp)), so label distance halves per round —
    * O(log diameter) rounds, not O(diameter); a 10^6-node chain
    * converges within the default cap. Non-convergence warns loudly. */
  private[graft] def connectedComponents(
      edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .cache()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // neighbor-min pass: each node adopts min(own, neighbors') label
      val nbrMin = sym
        .join(labels.withColumnRenamed("node", "dst")
          .withColumnRenamed("comp", "dst_comp"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
      // localCheckpoint does double duty: it truncates the lineage
      // (without it each round's plan embeds all previous rounds and
      // the optimizer/codegen blow up exponentially — OOMs by
      // ~iteration 15 even on tiny graphs) AND materializes `stepped`
      // ONCE for its two consumers below (pointer-jump lookup + join);
      // Spark does not dedupe common subplans, so an un-checkpointed
      // `stepped` would recompute the whole neighbor-min pass twice.
      // prev label rides along so convergence is a filter, not a join.
      val stepped = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .localCheckpoint(true)
      // pointer jump: comp := label(comp) — halves label distance per
      // round, turning O(diameter) hash-min into O(log diameter)
      val lookup = stepped.select(col("node").as("jnode"), col("comp").as("jcomp"))
      val next = stepped.join(lookup, col("comp") === col("jnode"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("jcomp"), col("comp"))).as("comp"),
          col("prev"))
        .localCheckpoint(true)
      changed = next.filter(col("comp") =!= col("prev")).count()
      // checkpoint blocks from previous rounds are freed by the
      // ContextCleaner once unreferenced (Dataset.unpersist is a no-op
      // for localCheckpoint blocks) — dropping the refs here suffices
      labels = next.select(col("node"), col("comp"))
      i += 1
    }
    sym.unpersist()
    if (changed > 0)
      System.err.println(
        s"[graft] connectedComponents: NOT converged after $maxIter rounds " +
          s"($changed labels still moving) — labels may be fragmented")
    labels
  }

  /** q47: components of the ≥3-common-neighbor LSN graph (q21's output
    * as the edge list) + per-component size — the "fraud ring" view.
    * Iteration count is data-dependent → rows-only driver check;
    * ComponentsSpec proves equality with a union-find reference. */
  def q47ConnectedComponents(spark: SparkSession, dir: String): DataFrame = {
    val lsn = Graph.q21CommonNeighbors(spark, dir)
      .select(col("u").as("src"), col("v").as("dst"))
    val labels = connectedComponents(lsn)
    labels
      .withColumn("comp_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("comp"))))
      .orderBy(col("comp"), col("node"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_connected_components" -> (q47ConnectedComponents _)
  )
}
