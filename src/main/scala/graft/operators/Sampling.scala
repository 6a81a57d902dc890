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

  /** Engine-portable pseudo-random bucket in [0, 10000): hex prefix of
   * md5 over the id's decimal string rendering — identical bytes in
   * any engine/language, stable under repartitioning and retries. */
  def sampleBucket(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 10000

  /**
   * Deterministic per-stratum Bernoulli sampling: a row survives iff
   * its [[sampleBucket]] falls below its stratum's threshold
   * (fraction × 10000). This is `df.stat.sampleBy` minus the
   * nondeterminism: a pure narrow filter — no shuffle, no seed state,
   * no rand() — so the sampled corpus is byte-reproducible across
   * engines, retries, and partitionings, which is what makes a
   * training-data subset auditable. Strata absent from `fractions`
   * fall back to `default` (0 = drop).
   */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      fractions: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((fractions.values.toSeq :+ default).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0, 1]")
    val thr = fractions.foldLeft(lit(math.round(default * 10000).toInt)) {
      case (acc, (k, f)) =>
        when(col(strataCol) === k, lit(math.round(f * 10000).toInt)).otherwise(acc)
    }
    df.filter(sampleBucket(col(idCol)) < thr)
  }

  /**
   * Deterministic mixture resampling: up/down-sample each stratum to a
   * target RATE = expected copies per row (rate > 1 upsamples by
   * replication — the capability [[stratifiedSample]]'s [0,1]
   * fractions lack). This is the data-mixing step of corpus assembly:
   * weight sources to a target mixture before training. A row of rate
   * r emits floor(r) guaranteed copies plus one more iff its
   * per-(id, copy) [[sampleBucket]]-style draw clears the fractional
   * part — every draw md5-derived, so the resampled mixture is
   * byte-reproducible across engines, retries, and partitionings.
   * Adds `copy_idx` (0-based) to the output.
   *
   * Scale shape: one narrow pass — explode over a literal-bounded
   * per-row sequence, codegen'd hash filter, no shuffle. Rate
   * thresholds resolve to integer literals at build time (no
   * per-row floating-point boundary ambiguity cross-engine).
   */
  def mixtureResample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], default: Double = 1.0): DataFrame = {
    require((rates.values.toSeq :+ default).forall(_ >= 0.0), "rates must be >= 0")
    def split(r: Double): (Int, Int) =
      (math.floor(r).toInt, math.round((r - math.floor(r)) * 10000).toInt)
    val (dFull, dThr) = split(default)
    val nFull = rates.foldLeft(lit(dFull)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(split(r)._1)).otherwise(acc) }
    val thr = rates.foldLeft(lit(dThr)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(split(r)._2)).otherwise(acc) }
    val copyBucket = conv(substring(md5(
        concat(col(idCol).cast("string"), lit(":"), col("copy_idx").cast("string"))
          .cast("binary")), 1, 8), 16, 10)
      .cast("long") % 10000
    df.withColumn("__nfull", nFull).withColumn("__thr", thr)
      .withColumn("copy_idx", explode(sequence(lit(0), col("__nfull"))))
      .filter(col("copy_idx") < col("__nfull") || copyBucket < col("__thr"))
      .drop("__nfull", "__thr")
  }

  /**
   * Deterministic weighted sampling without replacement: per group,
   * keep the `k` rows with the smallest priority u/w (sequential
   * Poisson sampling, Ohlsson 1998) — a row's selection probability is
   * approximately proportional to its weight, the standard
   * probability-proportional-to-size design for corpus subsetting
   * (sample documents ∝ quality score, orders ∝ value, ...).
   *
   * u/w rather than the Efraimidis–Spirakis u^(1/w) key is a
   * determinism decision, not a shortcut: the E-S key needs ln/pow,
   * whose last-ulp rounding differs across engines and could flip a
   * selection at the k-th boundary, while u here is EXACT
   * ((md5-slice + 0.5) / 2^32 — dyadic, so the double is the same in
   * any engine) and one IEEE division is correctly rounded everywhere
   * — the sampled set is byte-reproducible across engines, retries,
   * and partitionings. Ties (md5 collisions) break by id.
   *
   * Scale shape: one shuffle on the group column + a per-group window
   * top-k (Spark plans the rank filter as WindowGroupLimit — each
   * partition keeps k rows before the shuffle, so the exchange carries
   * O(groups x k), not the corpus). Rows with weight <= 0 are "never
   * sample" by definition and are filtered out up front (a negative
   * weight would otherwise sort FIRST and always win). Output keeps
   * the input columns only (the key is internal).
   */
  def weightedSample(df: DataFrame, groupCol: String, idCol: String,
      weight: Column, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val bucket = conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val u = (bucket.cast("double") + 0.5d) / 4294967296.0d
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__pri").asc, col(idCol))
    df.filter(weight.cast("double") > 0d)
      .withColumn("__pri", u / weight.cast("double"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__pri", "__rn")
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
  /**
   * Materialize a per-source token allocation into per-doc copy
   * counts (C66) — the terminal step after C63's fair allocation: an
   * allocation `a` for a source holding `n` total tokens means
   * floor(a/n) FULL epochs of every doc, plus ONE partial epoch of
   * ≈ (a mod n) tokens filled by a deterministic md5-order prefix
   * (stop before exceeding, so the undershoot is < one document —
   * never an overdraw). Repetition-with-partial-epoch is exactly how
   * a training run consumes an over-cap allocation; the md5 order
   * makes the partial epoch a uniform sample, reproducible across
   * engines, partitionings, and reruns.
   *
   * `alloc`: one row per source carrying `allocCol` (e.g. the
   * maxMinFair output — dimension-sized, broadcast). Output: every
   * input row plus `copies` (full + 0/1; a doc can carry 0). Scale:
   * one keyed exchange for the per-source prefix window; the joins
   * are broadcasts of per-source relations.
   */
  def budgetMaterialize(df: DataFrame, sourceCol: String, idCol: String,
      tokensCol: String, alloc: DataFrame, allocCol: String = "allocated"): DataFrame = {
    val tot = df.groupBy(col(sourceCol)).agg(sum(col(tokensCol)).as("__n_tok"))
    val order = md5(col(idCol).cast("string").cast("binary"))
    val w = Window.partitionBy(col(sourceCol)).orderBy(order, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.join(broadcast(alloc.select(col(sourceCol), col(allocCol).as("__alloc"))),
        Seq(sourceCol))
      .join(broadcast(tot), Seq(sourceCol))
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("copies",
        (expr("__alloc div __n_tok") +
          when(col("__cum") <= expr("__alloc % __n_tok"), 1L).otherwise(0L))
          .cast("long"))
      .drop("__alloc", "__n_tok", "__cum")
  }

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

  /**
   * Materialized packing: one row per (shard, chunk) with the chunk's
   * documents CONCATENATED in pack order — the step that turns
   * [[packSequences]]' chunk assignment into the actual training
   * sequences a data loader reads. Emits (shardCol, chunk_id,
   * n_docs, chunk_tok, chunk_text).
   *
   * Scale shape: the [[packSequences]] window (one shuffle per shard
   * group) followed by ONE (shard, chunk) aggregate; document text
   * moves exactly once, into its chunk's reassembly, and chunks are
   * budget-bounded by construction so no aggregate row can exceed
   * ~budget tokens of text. Order within a chunk is restored by
   * `sort_array` over (id, text) structs — builtin ordering, no
   * interpreted comparator lambda (the C27 reassembly pattern).
   */
  def materializePack(df: DataFrame, shardCol: String, idCol: String,
      textCol: String, tokens: Column, budget: Long): DataFrame =
    packSequences(df, shardCol, idCol, tokens, budget)
      .groupBy(col(shardCol), col("chunk_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("chunk_tok"),
        array_join(
          transform(
            sort_array(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          " ").as("chunk_text"))

  /**
   * Balanced shard assignment (C80) — split a corpus into `nShards`
   * near-equal token masses for a data-parallel training loader:
   * documents STRIPE across shards in (size desc, id) rank order
   * (rank mod nShards), the deterministic rendering of greedy
   * first-fit-decreasing — large docs spread first, each shard's
   * total differs from ideal by at most one stripe of ever-smaller
   * documents. Hash assignment balances COUNTS but not token mass
   * (heavy-tailed doc lengths skew it); this bounds the skew by
   * construction and is reproducible run to run.
   *
   * Scale shape: the global rank is [[graft.operators.Rank]]'s
   * two-level range-partitioned rank over a PACKED (size, id) key —
   * never a single-partition window over the corpus. The packing is
   * guarded fail-loud (B55 rule): sizes below 2²³, ids below 2⁴⁰, or
   * the pack is refused rather than silently mis-ranked. Ids must be
   * UNIQUE, also fail-loud (ADVICE r14): duplicate ids collapse to
   * one rank and silently co-locate on one shard, skewing exactly the
   * stripe balance this operator exists to bound.
   *
   * Emits (id, size, shard). */
  def shardAssign(df: DataFrame, idCol: String, sizeCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val in = df.select(col(idCol).cast("long").as("id"),
      col(sizeCol).cast("long").as("size"))
    val maxSize = 1L << 23
    val maxId = 1L << 40
    // The duplicate-id guard rides the pipeline's OWN first shuffle
    // (VERDICT r15: the r14-ADVICE fix ran count/countDistinct as a
    // second full action, 894→1229 ms; a combined distinct+percentile
    // aggregate was worse still — Expand doubles the scan). One
    // groupBy(id) both DEDUP-CHECKS (n_id != 1 fails loudly in the
    // key expression) and yields the (id, size, key) relation every
    // later pass needs. That relation is consumed by THREE separate
    // actions (boundary aggregate, prefix-offset collect, the final
    // join) — the legitimate eager-materialization case (r4 rule), so
    // it is localCheckpointed once: ~24 bytes/doc of id/size/key
    // longs, the corpus METADATA, not the corpus.
    val guarded = in.groupBy("id")
      .agg(count(lit(1)).as("n_id"), max(col("size")).as("size"))
      .select(col("id"), col("size"),
        when(col("n_id") =!= 1L, raise_error(concat(
          lit("shardAssign: duplicate ids — id="), col("id").cast("string"),
          lit(" appears "), col("n_id").cast("string"),
          lit(" times; every id must be unique"))))
        .when(col("size") >= 0L && col("size") < maxSize &&
              col("id") >= 0L && col("id") < maxId,
          (lit(maxSize - 1L) - col("size")) * maxId + col("id"))
        .otherwise(raise_error(concat(
          lit("shardAssign: (size, id) outside the packable domain at id="),
          col("id").cast("string")))).as("key"))
      .localCheckpoint()
    // boundary aggregate over proven-unique keys: the percentile over
    // raw keys IS distinctRanks' percentile over distinct keys, so the
    // rank pass skips its distinct shuffle outright
    val parts = 32
    val probs = (1 until parts).map(_.toDouble / parts)
    val g = guarded.agg(
      count(lit(1)).as("n"),
      percentile_approx(col("key"), typedLit(probs), lit(10000)).as("b")).head()
    if (g.getLong(0) == 0L)
      guarded.select(col("id"), col("size"), lit(0L).as("shard")).limit(0)
    else {
      val bounds = g.getSeq[Long](1).distinct.sorted.toArray
      val ranks = graft.operators.Rank.preDistinctRanks(
        guarded.select("key"), "key", bounds)
      guarded.join(ranks, guarded("key") === ranks("v"))
        .select(col("id"), col("size"),
          ((col("rank") - 1L) % nShards).as("shard"))
    }
  }
}
