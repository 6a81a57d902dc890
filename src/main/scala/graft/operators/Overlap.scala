package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._


/**
 * Cross-source corpus-overlap estimation via k-minimum-values (KMV)
 * sketches (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07) — the
 * set-similarity audit between corpus SOURCES, where the sets are far
 * too large to intersect directly.
 *
 * The question "how much of source A is re-crawled / mirrored in
 * source B?" over a 100 TB corpus is a pairwise set-similarity over
 * shingle sets of billions of elements. The KMV argument: the k
 * smallest hash values of a set are a uniform sample of its DISTINCT
 * elements, and for two sets the k smallest of the UNION restricted
 * to members of both k-min sketches estimates Jaccard as
 * |K(A∪B) ∩ K(A) ∩ K(B)| / |K(A∪B)| — so each source is reduced to a
 * BOUNDED sketch of k hashes in ONE pass (algebraic aggregate: the
 * k-smallest buffer combines map-side, merges associatively), and the
 * pairwise stage runs over #sources² sketches, independent of corpus
 * size. Complements C31's order-independent checksum (equality
 * audit) and C38's snapshot diff (row-level localization) with a
 * GRADED similarity between corpus partitions that never co-shuffles
 * the corpora.
 *
 * Everything is deterministic and engine-replayable: the element hash
 * is md5 hex (identical in DuckDB), the sketch is the k
 * lexicographically-smallest distinct hashes, and the estimate is an
 * integer ppm ratio — no doubles anywhere.
 */
object Overlap {

  /** Bounded k-smallest-distinct-strings aggregate: the buffer never
   * exceeds k entries regardless of input cardinality, partials
   * combine map-side, and merge is a trim-to-k union — the algebraic
   * shape that makes one sketch per source a single narrow shuffle of
   * ≤ k values per map partition (vs the window row_number approach,
   * which funnels EVERY distinct shingle of a source through one
   * reducer — the non-scalable formulation). */
  private class KMinAgg(k: Int)
      extends Aggregator[String, scala.collection.immutable.TreeSet[String], Seq[String]] {
    override def zero: scala.collection.immutable.TreeSet[String] =
      scala.collection.immutable.TreeSet.empty[String]
    override def reduce(b: scala.collection.immutable.TreeSet[String],
        h: String): scala.collection.immutable.TreeSet[String] = {
      if (b.size < k) b + h
      else if (h >= b.last) b // full and not smaller: no-op (covers h already present)
      else {
        val u = b + h
        if (u.size <= k) u else u - u.last
      }
    }
    override def merge(a: scala.collection.immutable.TreeSet[String],
        b: scala.collection.immutable.TreeSet[String]): scala.collection.immutable.TreeSet[String] = {
      val u = a ++ b
      if (u.size <= k) u else u.take(k)
    }
    override def finish(b: scala.collection.immutable.TreeSet[String]): Seq[String] =
      b.toSeq
    override def bufferEncoder: Encoder[scala.collection.immutable.TreeSet[String]] =
      Encoders.kryo[scala.collection.immutable.TreeSet[String]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Word-n-gram shingles with NO short-document fallback (a <n-word
   * document contributes nothing): the overlap metric is defined on
   * the shingle SET, and a whole-text pseudo-shingle would make
   * unrelated short docs collide. Computed by the codegen'd
   * [[graft.functions.expressions.wordNgrams]] kernel
   * (literal-whitespace tokens, byte-preserving — the C19/C30
   * tokenizer): the equivalent split→transform→slice→concat_ws tree
   * of higher-order functions always runs INTERPRETED and measured
   * 12× slower on this exact path (r14 probe: 3.3 s → 0.27 s for the
   * shingle+md5 stage at sf0.1). */
  private def strictShingles(text: Column, n: Int): Column =
    graft.functions.expressions.wordNgrams(coalesce(text, lit("")), n)

  /** Per-group KMV sketch: (grp, kmin: array<string>) with kmin the k
   * smallest distinct md5 hashes of the group's word-3-gram shingle
   * set, ascending. ONE bounded aggregate, no pre-distinct: the
   * TreeSet buffer deduplicates as it inserts (reduce is a set
   * insert), so a prior `.distinct()` would only repeat the dedup at
   * the cost of a full corpus-sized shuffle of every distinct shingle
   * — exactly the cost the KMV design exists to avoid. Map-side
   * partials are ≤ k entries each; the only shuffle is #groups rows
   * of ≤ k-hash buffers. */
  def kmvSketches(docs: DataFrame, groupCol: String, textCol: String,
      k: Int = 256, shingleN: Int = 3): DataFrame = {
    val kmin = udaf(new KMinAgg(k))
    docs
      .select(col(groupCol).as("grp"),
        explode(strictShingles(col(textCol), shingleN)).as("shingle"))
      .select(col("grp"), md5(col("shingle")).as("h"))
      .groupBy("grp")
      .agg(kmin(col("h")).as("kmin"))
  }

  /** Pairwise overlap estimates from the sketches: for each unordered
   * group pair (a < b), the KMV Jaccard estimate in integer ppm plus
   * its ingredients. `denom` < k means the union had fewer than k
   * distinct hashes and the estimate is EXACT. The pair join is
   * #groups² rows of k-arrays — driver-free, corpus-size-free. */
  def pairwiseOverlap(sketches: DataFrame, k: Int = 256): DataFrame = {
    val a = sketches.select(col("grp").as("src_a"), col("kmin").as("ka"))
    val b = sketches.select(col("grp").as("src_b"), col("kmin").as("kb"))
    a.join(b, col("src_a") < col("src_b"))
      .withColumn("k_union",
        slice(array_sort(array_union(col("ka"), col("kb"))), 1, k))
      .select(
        col("src_a"), col("src_b"),
        size(array_intersect(array_intersect(col("k_union"), col("ka")),
          col("kb"))).cast("long").as("matched"),
        size(col("k_union")).cast("long").as("denom"))
      .withColumn("jaccard_ppm", expr("matched * 1000000L div denom"))
  }

  /** The composed audit: per-source sketches → pairwise estimates. */
  def sourceOverlap(docs: DataFrame, groupCol: String = "source",
      textCol: String = "text", k: Int = 256): DataFrame =
    pairwiseOverlap(kmvSketches(docs, groupCol, textCol, k), k)
}
