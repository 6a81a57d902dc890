package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph scoring: PageRank in FIXED-POINT INTEGER arithmetic
 * (ppm scale). Link-graph centrality is a standard corpus-quality
 * signal for web-scale training data (rank pages by the link graph,
 * weight or filter documents by it); the fixed-point formulation
 * exists because float PageRank is not reproducible — a double sum
 * over thousands of partitions depends on reduction order, while an
 * integer sum does not, so this variant is bit-identical across
 * engines, partitionings, and retries, and therefore oracle-checkable
 * (`q_pagerank` unrolls the same integer recurrence in DuckDB).
 *
 * Recurrence (damping 85/100, rank_0 = 1_000_000 for every node):
 *   contrib(u)   = rank_i(u) div outdeg(u)          (integer div)
 *   rank_{i+1}(v) = 150_000 + (85 · Σ_{u→v} contrib(u)) div 100
 * Dangling-node mass is dropped (the simplified variant) — documented
 * rather than redistributed, and mirrored identically in the oracle.
 *
 * Scale shape: the edge list (with out-degrees attached once, up
 * front) is the only large state; each iteration is one
 * (edge ⋈ ranks) equi-join shuffle + one dst-keyed sum + a left join
 * back to the node universe. Lineage is truncated per round with an
 * eager checkpoint (reliable when a checkpoint dir is configured,
 * local otherwise) — same rule as connectedComponents: un-truncated
 * iterative plans nest and blow up analysis.
 */
object Graph {

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    def truncated(df: DataFrame): DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
      else df.localCheckpoint()

    val e = truncated(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct())
    val nodes = truncated(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    // out-degrees ride WITH the edges from the start — never recomputed
    // inside the loop
    val edgesDeg = truncated(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"))

    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val sums = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("in_sum"))
      ranks = truncated(nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(in_sum, 0L) div 100")).as("rank")))
    }
    ranks
  }
}
