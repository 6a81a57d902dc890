package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
 * web-scale through semantic deduplication"): partition embeddings
 * into k semantic cells by nearest centroid, then deduplicate ONLY
 * within a cell — keep a document iff no lower-id cell-mate sits at
 * cosine ≥ threshold. Near-duplicates land in the same cell with high
 * probability, so the quadratic compare is bounded by the largest cell
 * instead of the corpus (the same all-pairs-never-materialize argument
 * as the MinHash LSH family; cross-cell near-dups are the documented
 * approximation, and the exact brute-force baseline C5b bounds what
 * the cells can miss).
 *
 * Scale shape (100 TB): centroids stay a DataFrame broadcast into the
 * assignment cross join (no driver collect); assignment is one scan
 * through the codegen'd cosine argmax; the intra-cell self-join
 * shuffles both sides by cell id once. Cell sizes concentrate around
 * corpus/k by construction of k-means cells; a runaway cell is an AQE
 * skew-split, or pre-salt via [[graft.operators.Skew]] as with C32's
 * giant blocks.
 */
object SemDedup {

  /** Deterministic centroid seed: the `k` lowest-min-id DISTINCT-VALUE
   * vectors as (cid, cvec) — duplication-proof and
   * replication-invariant for the same reason as the ANN quantizer
   * init (a mass-duplicated corpus must not seed every cell with
   * copies of one vector). One value-keyed aggregate with map-side
   * combine, then a k-row TakeOrdered. */
  def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    emb.groupBy(col(vecCol).as("cvec"))
      .agg(min(col(idCol)).as("cid"))
      .orderBy("cid").limit(k)
      .select("cid", "cvec")

  /**
   * Per-document semantic-dedup verdict: (idCol, cluster, keep) for
   * EVERY input row — cluster = argmax-cosine centroid id (ties broken
   * by lowest cid), keep = no lower-id cell-mate at cosine ≥
   * threshold.
   */
  def semanticKeep(emb: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double): DataFrame = {
    val w = Window.partitionBy("__id").orderBy(col("__sim").desc, col("__cid"))
    val assigned = emb
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(
        centroids.select(col("cid").as("__cid"), col("cvec").as("__cv"))))
      .withColumn("__sim",
        graft.functions.expressions.cosineSim(col("__v"), col("__cv")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__v"), col("__cid").as("cluster"))
    val a = assigned
      .select(col("cluster"), col("__id").as("__ida"), col("__v").as("__va"))
    val b = assigned
      .select(col("cluster"), col("__id").as("__idb"), col("__v").as("__vb"))
    val dups = a.join(b, Seq("cluster"))
      .filter(col("__idb") < col("__ida") &&
        graft.functions.expressions.cosineSim(col("__va"), col("__vb")) >= threshold)
      .select(col("__ida").as("__dup")).distinct()
    assigned
      .join(dups, col("__id") === col("__dup"), "left")
      .select(col("__id").as(idCol), col("cluster"),
        col("__dup").isNull.as("keep"))
  }
}
