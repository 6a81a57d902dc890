package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Fixed-point unigram surprisal scoring — the perplexity-proxy quality
 * signal (rare-token density) of CCNet/Gopher-style corpus filtering,
 * re-expressed so every value is an INTEGER and the whole pipeline is
 * engine-replayable.
 *
 * True surprisal is −log p(w), which drags in libm and
 * reduction-order float sums (the same unverifiability that pushed
 * PageRank and BM25 to fixed point). The trade here: quantize −log2 to
 * the BIT LENGTH of the corpus count — surprisal(w) =
 * bitlen(total_tokens) − bitlen(count(w)) — computed with the built-in
 * `length(bin(x))` on BOTH engines, so the oracle replays it exactly.
 * bitlen is ⌊log2⌋+1, so the score is the integer-log2 surprisal in
 * whole bits: coarse, monotone in 1/frequency, and bit-identical
 * everywhere.
 *
 * Scale shape: token→count join shuffles on the word (vocabulary-sized
 * right side, Zipf-headed — AQE handles the hot stopwords), per-doc
 * sums are map-side combined, and the corpus total is a 1-row
 * broadcast. No driver state, no doubles.
 */
object Surprisal {

  /** Per-document integer surprisal: (idCol, n_tokens, surprisal_sum,
   * surprisal_milli = 1000·sum div n). Documents with zero tokens have
   * no surprisal and are absent from the output (the token explode
   * yields no rows for them — same in the SQL replay). */
  def docSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // spread: tokenization of a few-file corpus otherwise runs on the
    // scan's task count (r19; conditional — many-file inputs pass through)
    val toks = graft.dedup.Dedup.spread(docs).select(col(idCol),
      explode(TextFunctions.words(col(textCol))).as("w"))
    val counts = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val totalBits = counts.agg(length(bin(sum("cnt"))).as("bits_total"))
    toks
      .join(counts, "w")
      .crossJoin(broadcast(totalBits))
      .select(col(idCol),
        (col("bits_total") - length(bin(col("cnt")))).cast("long").as("s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum("s").as("surprisal_sum"))
      .withColumn("surprisal_milli",
        expr("surprisal_sum * 1000L div n_tokens"))
  }

  /**
   * Bigram surprisal with stupid-backoff — the next step toward the
   * KenLM-style scoring CCNet actually uses: score each document's
   * bigrams against counts from a TRAINING corpus (held-out scoring
   * is what makes backoff real — self-scoring never meets an unseen
   * bigram). Per bigram (w1, w2), in whole bits:
   *
   *  - bigram seen in train:    bitlen(c(w1)) − bitlen(c(w1 w2))
   *    (the integer-log2 of 1/p(w2|w1));
   *  - unseen bigram, backoff:  1 + bitlen(N) − bitlen(c(w2))
   *    (unigram surprisal of w2 plus a 1-bit stupid-backoff penalty;
   *    an unseen w2 contributes the max 1 + bitlen(N)).
   *
   * All integers (`length(bin(x))` on both engines), so the oracle
   * replays the model bit-for-bit. Scale shape: two train-side count
   * tables built with map-side combine (vocabulary- and
   * bigram-vocabulary-sized), three LEFT equi-joins from the scored
   * bigrams (Zipf heads are AQE's skew case), per-doc sums map-side
   * combined, the train token total a 1-row broadcast.
   *
   * Documents with fewer than two tokens have no bigrams and are
   * absent, like [[docSurprisal]]'s token-free docs.
   */
  def docBigramSurprisal(docs: DataFrame, train: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def pairsOf(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]) = {
      val toks = df.select(cols :+
        posexplode(TextFunctions.words(col(textCol))).as(Seq("i", "w1")): _*)
      val w = Window.partitionBy(idCol).orderBy("i")
      toks.withColumn("w2", lead("w1", 1).over(w)).filter(col("w2").isNotNull)
    }
    val trainToks = train.select(col(idCol),
      explode(TextFunctions.words(col(textCol))).as("w"))
    val uni = trainToks.groupBy("w").agg(count(lit(1)).as("cu"))
    val biC = pairsOf(train, Seq(col(idCol)))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val totalBits = trainToks.agg(length(bin(count(lit(1)))).as("bits_n"))
    pairsOf(docs, Seq(col(idCol)))
      .join(uni.select(col("w").as("w1"), col("cu").as("cu1")), Seq("w1"), "left")
      .join(biC, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
      .crossJoin(broadcast(totalBits))
      .select(col(idCol),
        when(col("cb").isNotNull,
          length(bin(col("cu1"))) - length(bin(col("cb"))))
          .otherwise(lit(1) + col("bits_n") -
            coalesce(length(bin(col("cu2"))), lit(0)))
          .cast("long").as("s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), sum("s").as("surprisal_sum"))
      .withColumn("surprisal_milli",
        expr("surprisal_sum * 1000L div n_bigrams"))
  }
}
