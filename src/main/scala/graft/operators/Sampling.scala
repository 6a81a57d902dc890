package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus subsetting operators for training-data pipelines: per-group
 * quota sampling (language/domain balancing) and sequential token
 * packing (documents → fixed-size context windows).
 *
 * Both are deterministic by construction — a sampling decision that
 * changes across retries or partitionings silently changes the
 * training set, so "random" here always means "hash-ordered", never
 * rand().
 */
object Sampling {

  /**
   * Keep at most `quota` rows per group, chosen by a deterministic
   * pseudo-random order (md5 of the id rendered as a string — stable
   * across engines, partitionings, and retries; ties broken by id).
   * The standard language/source-balancing step of corpus assembly.
   *
   * Scale shape: one shuffle on the group column; within each group a
   * window row_number. A group so hot it swamps one reducer is exactly
   * the group whose quota discards almost everything — for those,
   * pre-filter with a cheap hash predicate before the exact pass.
   */
  def quotaSample(df: DataFrame, groupCol: String, idCol: String, quota: Int): DataFrame = {
    require(quota > 0, "quota must be positive")
    val order = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(groupCol)).orderBy(order, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /**
   * Sequential packing: documents are (logically) concatenated in
   * `idCol` order within each `shardCol` group and cut into
   * `budget`-token context windows — each doc is assigned the chunk
   * its first token lands in (`chunk_id`) and its offset in that
   * chunk (`chunk_off`). This is the concat-then-split packing used
   * for LLM pretraining batches, expressed as one cumulative-sum
   * window.
   *
   * The shard column bounds the window: packing is embarrassingly
   * parallel across shards (a global pack order at corpus scale would
   * serialize onto one reducer). `tokens` is any integer column
   * expression (e.g. a codegen'd token count).
   */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tok", tokens.cast("long"))
      .withColumn("__prev", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // integer division — `/` on longs goes through double and loses
      // exactness once cumulative offsets exceed 2^53
      .withColumn("chunk_id", expr(s"`__prev` div ${budget}L"))
      .withColumn("chunk_off", col("__prev") % budget)
      .drop("__prev")
  }
}
