package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus term weighting: TF-IDF top terms per document, and BM25
 * scoring — the relevance/keyword-extraction primitives of a text
 * pipeline.
 *
 * Scale shape: term frequencies are one (doc, term) hash aggregation
 * with map-side combine; document frequencies are a second
 * aggregation over the term dimension, whose result (the vocabulary)
 * is orders of magnitude smaller than the corpus and broadcasts back.
 * The per-doc top-k is a window over the doc partition — never a
 * global sort.
 */
object TfIdf {

  /** One row per (doc, term) with term frequency — tokenization is the
   * codegen'd literal-whitespace kernel (engine-portable). */
  private def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.expressions.wordNgrams(col(textCol), 1)).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))

  /**
   * Top-k terms per document by TF-IDF with a RATIONAL idf (N/df
   * rather than ln(N/df)): rank order per document is what matters
   * for keyword extraction, the rational form preserves it for terms
   * with equal tf, and — unlike ln, whose last-ulp rounding is
   * libm-specific — integer multiply + one IEEE division is
   * bit-identical across engines, making the result exactly
   * reproducible. Output: (doc_id, rnk, term, score).
   */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.agg(count_distinct(col("doc_id")).as("n"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "score")
  }

  /**
   * BM25 per (doc, term): idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
   * with the classic idf = ln(1 + (N−df+0.5)/(df+0.5)). The ranking
   * function for retrieval-style scoring; not oracle-checked (ln) —
   * see TfIdfSpec for the semantic checks.
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), avg("dl").as("avgdl"))
    tf.join(dl, "doc_id")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("bm25", col("idf") * (col("tf") * (k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .select("doc_id", "term", "tf", "bm25")
  }

  /**
   * FIXED-POINT BM25 per (doc, term): the same k1 = 1.2 / b = 0.75
   * scoring as [[bm25]], but with the ln idf replaced by its exact
   * rational odds (N−df+½)/(df+½) and the whole score evaluated as ONE
   * 64-bit integer division at ppm scale — ln's last-ulp rounding is
   * libm-specific, while integer arithmetic is bit-identical across
   * engines, so this variant is hash-verifiable cross-engine (the same
   * trade [[topTerms]] and the ppm PageRank make). ln(1+x) is monotone
   * in x, so single-term ranking is IDENTICAL to classic BM25;
   * multi-term sums can reorder only documents whose classic scores
   * were already within the log-vs-odds distortion of each other.
   *
   * With avgdl = S/N (S = corpus tokens, N = docs), the exact value is
   *
   *   score_ppm = ⌊10⁶ · (2N−2df+1) · 22·tf·S /
   *                     ((2df+1) · (10·S·tf + 3·S + 9·dl·N))⌋
   *
   * (numerator and denominator each multiplied through by 10·S and the
   * half-integers cleared). Numerator and denominator evaluate in
   * decimal(38,0) — the long formulation needed
   * 2.2·10⁷·(2N)·tf·S < 2⁶³, i.e. N·S ≲ 2·10¹¹/tf_max, and the r15
   * sf1 sweep (N·S ≈ 1.4·10¹¹) crossed exactly that line and threw
   * (ANSI, loud — the B55 rule working as intended). Decimal lifts
   * the bound past any physical corpus (< 10³⁸); the QUOTIENT is
   * ppm-scale and lands back in a long, and integer division is
   * value-identical in either width, so every oracle hash is
   * unchanged.
   *
   * Scale shape: tf is one (doc, term) hash aggregation; df and the
   * 1-row (N, S) stats broadcast back (vocabulary ≪ corpus); the score
   * itself is a per-row integer expression inside codegen.
   */
  def bm25Ppm(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("s"))
    tf.join(dl, "doc_id")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__num",
        expr("cast(1000000 as decimal(38,0)) * (2 * n - 2 * df + 1) * 22 * tf * s"))
      .withColumn("__den",
        expr("(2 * df + 1) * (cast(10 as decimal(38,0)) * s * tf" +
          " + cast(3 as decimal(38,0)) * s + cast(9 as decimal(38,0)) * dl * n)"))
      .withColumn("score_ppm", expr("cast(__num div __den as long)"))
      .select("doc_id", "term", "tf", "score_ppm")
  }

  /**
   * Ranked retrieval: top-k documents for a bag-of-words query by
   * summed [[bm25Ppm]] term scores (integer sums — reduction-order
   * free), ties broken by doc id. The top-k is TakeOrdered (per
   * partition heads + driver merge of k rows), never a global sort.
   * Output: (doc_id, n_terms, score_ppm).
   */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame =
    bm25Ppm(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("score_ppm").as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
}
