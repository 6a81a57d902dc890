package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Grouped top-k in BOUNDED state — the scale-safe alternative to the
 * window-function formulation.
 *
 * `row_number() OVER (PARTITION BY g ORDER BY score)` materializes and
 * sorts EVERY row of every group through the shuffle before discarding
 * all but k — at 100 TB that is a full-data sort whose only output is
 * k rows per group. The aggregate formulation keeps a k-bounded
 * ordered buffer per (partition, group) partial, combines map-side,
 * and ships at most k rows per partition per group to the reducer:
 * shuffle volume k·partitions·groups, independent of input size, and
 * no sort ever sees more than k elements. Deterministic tie-break
 * (score desc, id asc) makes the result — and the driver's oracle
 * replay via the window formulation — exact.
 */
object TopK {

  /** One ranked item: the score and a deterministic tie-break id. */
  case class Scored(score: Long, id: Long)

  private class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    // best-first total order: higher score first, then lower id
    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    override def zero: List[Scored] = Nil
    override def reduce(b: List[Scored], a: Scored): List[Scored] = {
      if (b.length >= k && !better(a, b.last)) b
      else {
        val (front, back) = b.span(better(_, a))
        (front ::: a :: back).take(k)
      }
    }
    override def merge(x: List[Scored], y: List[Scored]): List[Scored] = {
      // merge of two ≤k sorted lists, truncated at k
      val out = List.newBuilder[Scored]
      var (xs, ys, n) = (x, y, 0)
      while (n < k && (xs.nonEmpty || ys.nonEmpty)) {
        if (ys.isEmpty || (xs.nonEmpty && better(xs.head, ys.head))) {
          out += xs.head; xs = xs.tail
        } else { out += ys.head; ys = ys.tail }
        n += 1
      }
      out.result()
    }
    override def finish(b: List[Scored]): Seq[Scored] = b
    override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Top `k` rows per group by (`scoreCol` desc, `idCol` asc), as
   * (groupCols..., rank, score, id) with rank 1-based. One bounded
   * aggregate — never a per-group sort of the full input. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val agg = udaf(new TopKAgg(k))
    val gs: Seq[Column] = groupCols.map(col)
    df.groupBy(gs: _*)
      .agg(agg(col(scoreCol).cast("long"), col(idCol).cast("long")).as("top"))
      .select(gs :+ posexplode(col("top")): _*)
      .select(gs ++ Seq((col("pos") + 1L).as("rank"),
        col("col.score").as("score"), col("col.id").as("id")): _*)
  }

  /** Top-k labels per group PLUS an `OTHERS` completeness bucket
   * (B93) — the reporting contract [[topKPerGroup]] cannot give: the
   * emitted rows must account for 100% of each group's mass, so a
   * reader can tell "top 3 brands are 40% of the nation" from "the
   * tail is the story". Input is the (group, label, value) ROLLUP —
   * already aggregated, domain-bounded (the B62 dedup-ahead-of-window
   * discipline) — so the rank window sorts label DOMAINS, never
   * facts, and the OTHERS fold plus the share window reuse the same
   * group partitioning: one keyed exchange end to end. Ties rank
   * deterministically (value desc, label asc); OTHERS carries rank
   * k+1, its member count, and like every row its exact integer ppm
   * share of the group total.
   */
  def topKWithOthers(rollup: DataFrame, group: Seq[String], label: String,
      value: String, k: Int, othersLabel: String = "OTHERS"): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val gs: Seq[Column] = group.map(col)
    val w = Window.partitionBy(gs: _*).orderBy(col(value).desc, col(label))
    val wg = Window.partitionBy(gs: _*)
    rollup
      .withColumn("__rn", row_number().over(w))
      .withColumn("__lab",
        when(col("__rn") <= k, col(label)).otherwise(lit(othersLabel)))
      .groupBy(gs :+ col("__lab").as(label): _*)
      .agg(sum(col(value)).as(value), count(lit(1)).as("n_members"),
        min("__rn").as("rank"))
      .withColumn("__tot", sum(col(value)).over(wg))
      // decimal(38,0) ahead of the ×1e6: a bigint product silently
      // needs group mass < 9.2e12 — the B55 overflow class
      .withColumn("share_ppm",
        expr(s"cast($value as decimal(38,0)) * 1000000 div __tot"))
      .drop("__tot")
  }
}
