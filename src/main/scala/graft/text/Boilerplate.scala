package graft.text

import graft.functions.expressions.wordChunks
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Per-group boilerplate removal: cut from every document the segments
 * that recur across a large FRACTION of the documents in the same
 * group (site/domain/source). This is the CCNet/RefinedWeb-style
 * boilerplate filter — navigation bars, cookie banners, per-site
 * footers repeat on most pages OF THAT SITE while being rare in the
 * corpus at large, so the frequency test must be group-relative.
 * [[SegmentDedup]] is the complementary global step: it cuts segments
 * duplicated in >= N documents ANYWHERE; this operator cuts segments
 * frequent WITHIN their group even when the group is a tiny slice of
 * the corpus (25 docs of one site inside 100 TB).
 *
 * Scale shape (the DETECTION path shuffles hashes only; text moves
 * once, for reassembly):
 *  1. one scan explodes each doc to (group, doc_id, cidx, chunk_hash)
 *     via the codegen'd chunk kernel — the 64-bit hash stands in for
 *     the segment string in the frequency pass;
 *  2. per-group doc counts are one tiny aggregate (rows = groups),
 *     joined onto the per-(group, hash) distinct-doc counts — ONE
 *     hash-aggregate shuffle keyed (group, hash), the same shape as
 *     segment dedup with the group prepended to the key;
 *  3. the boilerplate set (group, hash) — tiny by construction: only
 *     chunks clearing the frequency floor survive — joins back to mark
 *     chunks (AQE broadcasts it when small), and survivors reassemble
 *     per doc with one aggregate (the single stage that moves chunk
 *     text), original order restored via the chunk index.
 *
 * The frequency threshold compares in integer permille space
 * (ndocs * 1000 >= permille * group_docs) — no per-row double
 * boundary to disagree about across engines. Hash-space ≡
 * string-space is re-proved on every run by the `q_boilerplate`
 * oracle, which replays the whole pipeline over segment STRINGS in
 * DuckDB (C4b/C27 pattern).
 */
object Boilerplate {

  /**
   * Per-document cleaned text after cutting chunks that appear in
   * >= `minFrac` of the group's documents AND >= `minDocs` documents
   * absolute (the floor keeps tiny groups from declaring everything
   * boilerplate: in a 2-doc group any shared chunk is 50% frequent).
   * Returns every input document: (idCol, groupCol, clean_text,
   * n_chunks, n_removed); empty/null text comes back with n_chunks=0.
   */
  def stripFrequent(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, chunkWords: Int = 8,
      minFrac: Double = 0.3, minDocs: Int = 3): DataFrame = {
    require(minFrac > 0.0 && minFrac <= 1.0, "minFrac must be in (0, 1]")
    require(minDocs >= 2, "minDocs must be at least 2")
    val permille = math.round(minFrac * 1000).toInt
    val segs = docs.select(col(groupCol), col(idCol),
        posexplode(wordChunks(coalesce(col(textCol), lit("")), chunkWords))
          .as(Seq("cidx", "chunk")))
      .withColumn("ch", xxhash64(col("chunk")))
    val groupDocs = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__gdocs"))
    val boiler = segs.groupBy(col(groupCol), col("ch"))
      .agg(countDistinct(col(idCol)).as("__ndocs"))
      // no broadcast hint: groups can number in the millions at corpus
      // scale (one row per domain) — AQE broadcasts when actually small
      .join(groupDocs, Seq(groupCol))
      .filter(col("__ndocs") >= minDocs &&
        col("__ndocs") * 1000 >= col("__gdocs") * permille)
      .select(col(groupCol).as("__bg"), col("ch").as("__bch"))
    val marked = segs.join(boiler,
        segs(groupCol) === col("__bg") && segs("ch") === col("__bch"), "left")
      .select(col(groupCol), col(idCol), col("cidx"), col("chunk"),
        col("__bch").isNotNull.as("removed"))
    val perDoc = marked.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            sort_array(collect_list(
              when(!col("removed"), struct(col("cidx"), col("chunk"))))),
            s => s.getField("chunk")),
          " ").as("clean_text"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("removed"), 1L).otherwise(0L)).as("n_removed"))
    docs.select(col(idCol), col(groupCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col(groupCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
  }
}
