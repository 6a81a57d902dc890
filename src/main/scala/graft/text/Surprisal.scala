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
    val toks = docs.select(col(idCol),
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
}
