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
 * back to the node universe. Each round materializes to PARQUET in a
 * scratch dir and reads back — a file-based lineage truncation.
 * Measured against the alternatives on the 105-query bench session:
 * as one giant unmaterialized DAG the repeated edge/degree subtrees
 * re-execute per iteration (59 s for 3 rounds at sf0.1); with
 * `localCheckpoint` the round is fast but the cached round blocks
 * pinned in the block manager degraded every LATER query of the
 * long-lived session 3-5× (partially recovered by unpersist, not
 * fully); the parquet round-trip keeps the query at seconds with
 * ZERO block-manager state — and is exactly what a cluster run wants
 * anyway (a restartable, executor-loss-safe round snapshot). Scratch
 * location: [[graft.Scratch]] — set `spark.graft.scratchDir` to a
 * durable shared filesystem on a cluster; the local default is a
 * per-application temp dir deleted by one JVM-exit hook.
 */
object Graph {

  private val callSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    val spark = edges.sparkSession
    val scratch = s"${graft.Scratch.root(spark)}/pagerank_${callSeq.incrementAndGet()}"
    def materialize(df: DataFrame, name: String): DataFrame = {
      df.write.mode("overwrite").parquet(s"$scratch/$name")
      spark.read.parquet(s"$scratch/$name")
    }

    val e = materialize(edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct(), "edges")
    val nodes = materialize(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct(),
      "nodes")
    // out-degrees ride WITH the edges from the start — never recomputed
    // inside the loop
    val edgesDeg = materialize(
      e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src"), "edges_deg")

    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (i <- 1 to iters) {
      val sums = edgesDeg.join(ranks, edgesDeg("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("in_sum"))
      ranks = materialize(nodes.join(sums, nodes("node") === sums("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(in_sum, 0L) div 100")).as("rank")),
        s"ranks_$i")
    }
    ranks
  }
}
