package graft.similarity

import graft.dedup.Dedup
import graft.functions.expressions.nearestCentroids
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * [[bruteForceTopK]] is the exact baseline: broadcast the (small)
 * probe set against the corpus — one scan, no shuffle of the corpus,
 * per-partition partial top-k via the window only after the narrow
 * cosine computation. At 100 TB the corpus side stays partitioned;
 * only probes move.
 *
 * [[lshTopK]] is the scale path: random-hyperplane signatures bucket
 * the corpus; probes only score candidates sharing a signature band
 * (pigeonhole multiprobe), cutting the scored set by orders of
 * magnitude at controlled recall. An IVF variant would swap the
 * signature for a nearest-centroid id — same plan shape.
 */
object Ann {

  /** Exact top-k by cosine for each probe row. Output:
   * (probe_id, rank, vec_id, cos). */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"))
    // spread: a few-file corpus must not score on a handful of cores
    val c = Dedup.spread(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    c.crossJoin(broadcast(p))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), Dedup.cosine(col("p_vec"), col("c_vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "vec_id", "cos")
  }

  /** LSH-bucketed approximate top-k: score only candidates sharing at
   * least one signature band with the probe. numPlanes/bandBits is the
   * recall-vs-cost knob (more, narrower bands → higher recall, larger
   * candidate sets). Same output shape as [[bruteForceTopK]]. */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int,
      numPlanes: Int = 32, bandBits: Int = 4): DataFrame = {
    // band join on ids only; vectors join back per deduped candidate
    def banded(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id),
        posexplode(Dedup.signatureBands(
          Dedup.hyperplaneSignature(col(vecCol), dim, numPlanes), numPlanes, bandBits)))
        .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_val"))
    val cand = banded(Dedup.spread(corpus), "vec_id")
      .join(broadcast(banded(probes, "probe_id")), Seq("band_idx", "band_val"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select("probe_id", "vec_id")
      .distinct()
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    cand
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("c_vec")), Seq("vec_id"))
      .join(broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"))), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"), Dedup.cosine(col("p_vec"), col("c_vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "vec_id", "cos")
  }

  /**
   * IVF (inverted-file) approximate top-k. The coarse quantizer here
   * samples `numCells` corpus vectors as centroids (deterministic,
   * lowest ids — a production index would run k-means; the plan shape
   * is identical). Corpus vectors index into their nearest cell; each
   * probe scores only the cells on its `nProbe` multiprobe list. Cell
   * assignment is a single codegen'd expression; at 100 TB the index
   * side would additionally be written partitioned by cell so a query
   * touches only its probe-list partitions.
   */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int,
      numCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroidRows = corpus.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(numCells).collect()
    val centroids: Array[Double] = centroidRows.flatMap { r =>
      r.get(1).asInstanceOf[scala.collection.Seq[Any]].map {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d.doubleValue()
      }
    }
    val c = Dedup.spread(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("c_vec"),
      element_at(nearestCentroids(col(vecCol), centroids, dim, 1), 1).as("cell"))
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("p_vec"),
      explode(nearestCentroids(col(vecCol), centroids, dim, nProbe)).as("cell"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(p), Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), Dedup.cosine(col("p_vec"), col("c_vec")).as("cos"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "rank", "vec_id", "cos")
  }
}
