package graft

import graft.dedup.Dedup
import graft.similarity.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress: replicate the sf0.1 corpus 20× (100k docs, every doc
  * duplicated 20 times — worst-case bucket skew for LSH banding) and
  * run the dedup/ANN paths end-to-end. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCALE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // Materialize every output row+column inside a timed region — a
    // timer around a lazy transform alone measures plan construction
    // (milliseconds) and silently shifts the real work into whatever
    // downstream check runs the plan first.
    def timedRun(label: String)(df: => org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      // construction runs INSIDE the timer: iterative operators
      // (criticalPath, cycleStats, pageRank-style loops) do their work
      // eagerly while building, and timing only the final noop write
      // would report ~0 s for them
      time(label) {
        val built = df
        built.write.mode("overwrite").format("noop").save()
        built
      }

    val docs = Tables.table(spark, dir, "documents")
    val n = 20
    // replicate with distinct ids: id' = doc_id * n + replica
    val big = docs.crossJoin(spark.range(n).toDF("rep"))
      .select((col("doc_id") * n + col("rep")).as("doc_id"), col("text"))
    println(s"SCALE corpus: ${big.count()} docs")

    val kept = time(s"minhashKeep ${n}x") {
      Dedup.minhashKeep(big, "doc_id", "text", threshold = 0.8)
        .filter(col("keep")).count()
    }
    // every original doc has 20 identical copies; keep-first must keep
    // at most one per near-dup cluster
    println(s"SCALE minhash kept: $kept of ${big.count()}")

    // SimHash under the same 20× mass-duplication skew. Replication is
    // id-order-preserving (id' = doc_id·n + rep), so keep-first over the
    // replicated corpus must keep EXACTLY {d·n : d kept unreplicated} —
    // rep-0 of every unreplicated survivor, nothing else. Any drift means
    // the layered exact-collapse or the pigeonhole blocking broke under
    // skew, not just slowed down.
    val simKept0 = Dedup.simhashKeep(docs, "doc_id", "text")
      .filter(col("keep")).select((col("doc_id") * n).as("doc_id"))
    val simKeptN = timedRun(s"simhashKeep ${n}x") {
      Dedup.simhashKeep(big, "doc_id", "text")
        .filter(col("keep")).select("doc_id")
    }
    val simDrift = simKeptN.unionAll(simKept0)
      .groupBy("doc_id").agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    require(simDrift == 0, s"simhash keep-set drifted under ${n}x replication: $simDrift ids")
    println(s"SCALE simhash kept: ${simKept0.count()} (drift 0)")

    // Containment dedup under the same 20× mass-duplication skew: the
    // layered exact-collapse reduces the replicated corpus to the same
    // representative set (rep = rep-0 copy, id' = 20·d preserves id
    // order and shingle sizes are replica-invariant), so keep-first
    // over the replicated corpus must keep EXACTLY {20·d : d kept
    // unreplicated} — any drift means the anchor blocking or the
    // (size, id) kill rule broke under skew.
    val contKept0 = Dedup.containmentKeep(docs, "doc_id", "text")
      .filter(col("keep")).select((col("doc_id") * n).as("doc_id"))
    val contKeptN = timedRun(s"containmentKeep ${n}x") {
      Dedup.containmentKeep(big, "doc_id", "text")
        .filter(col("keep")).select("doc_id")
    }
    val contDrift = contKeptN.unionAll(contKept0)
      .groupBy("doc_id").agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
    require(contDrift == 0, s"containment keep-set drifted under ${n}x replication: $contDrift ids")
    println(s"SCALE containment kept: ${contKept0.count()} (drift 0)")

    // Decontamination at 20×: contamination is a per-document property,
    // so every replica must report exactly the unreplicated doc's
    // n_hit_grams (the broadcast bench gram set is replica-blind).
    val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
    val train0 = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0)
    val bigTrain = train0.crossJoin(spark.range(n).toDF("rep"))
      .select((col("doc_id") * n + col("rep")).as("doc_id"), col("text"))
    val deconN = timedRun(s"decontaminate ${n}x") {
      graft.text.Decontaminate.markContaminated(bigTrain, bench, "doc_id", "text", n = 4)
    }
    val decon0 = graft.text.Decontaminate.markContaminated(train0, bench, "doc_id", "text", n = 4)
      .select((col("doc_id")).as("orig_id"), col("n_hit_grams").as("hits0"))
    val deconDrift = deconN
      .select((col("doc_id") / n).cast("long").as("orig_id"), col("n_hit_grams"))
      .join(decon0, Seq("orig_id"))
      .filter(col("n_hit_grams") =!= col("hits0")).count()
    require(deconDrift == 0, s"decontaminate drifted under ${n}x replication: $deconDrift rows")
    println(s"SCALE decontaminate: ${deconN.filter(col("contaminated")).count()} contaminated of ${bigTrain.count()} (drift 0)")

    // Span excision at 20×: like decontaminate, excision is a
    // per-document property (the benchmark gram set is replica-blind),
    // so every replica must rebuild exactly its original's
    // (clean_text, n_removed) — drift means the cover merge or the
    // ordered rebuild broke under mass duplication.
    val spansN = timedRun(s"exciseContaminated ${n}x") {
      graft.text.Decontaminate.exciseContaminated(bigTrain, bench, "doc_id", "text", n = 4)
    }
    val spans0 = graft.text.Decontaminate
      .exciseContaminated(train0, bench, "doc_id", "text", n = 4)
      .select(col("doc_id").as("orig_id"), col("clean_text").as("ct0"),
        col("n_removed").as("nr0"))
    val spansDrift = spansN
      .select((col("doc_id") / n).cast("long").as("orig_id"),
        col("clean_text"), col("n_removed"))
      .join(spans0, Seq("orig_id"))
      .filter(col("clean_text") =!= col("ct0") || col("n_removed") =!= col("nr0"))
      .count()
    require(spansDrift == 0, s"span excision drifted under ${n}x replication: $spansDrift rows")
    println(s"SCALE span excision: ${spans0.filter(col("nr0") > 0).count()} docs cut (drift 0)")

    // Segment dedup at 20×: every segment now occurs in 20 distinct
    // docs (worst-case duplicated-hash-set size — the dup side of the
    // join is the WHOLE segment space), so every chunk of every doc
    // must be cut: n_removed == n_chunks globally, clean_text empty.
    val segN = time(s"segmentDedup ${n}x") {
      graft.text.SegmentDedup.cleanChunks(big, "doc_id", "text")
        .agg(sum("n_chunks").as("nc"), sum("n_removed").as("nr"),
          max(length(col("clean_text"))).cast("long").as("maxlen"))
        .head()
    }
    require(segN.getLong(0) == segN.getLong(1) && segN.getLong(2) == 0,
      s"segment dedup under ${n}x replication must cut every chunk: $segN")
    println(s"SCALE segment dedup: ${segN.getLong(1)} of ${segN.getLong(0)} chunks cut (all)")

    // Per-group boilerplate at 20×: replication stays within the SAME
    // source, so per-(source, chunk) doc counts AND per-source doc
    // counts both scale by 20 — every frequency fraction is invariant,
    // and scaling the absolute floor by 20 makes the whole threshold
    // predicate identical. Every replica must therefore report exactly
    // its original doc's (clean_text, n_removed); drift means the
    // group-relative counting broke under mass duplication.
    val bigSrc = docs.crossJoin(spark.range(n).toDF("rep"))
      .select((col("doc_id") * n + col("rep")).as("doc_id"), col("text"), col("source"))
    // minFrac 0.05: the hottest per-source chunk at sf0.1 sits at 8%
    // df, so a 5% bar makes the cut set NON-empty (the invariant must
    // hold on real cuts, not vacuously on an empty boilerplate set)
    val boil0 = graft.text.Boilerplate
      .stripFrequent(docs, "doc_id", "text", "source",
        chunkWords = 2, minFrac = 0.05, minDocs = 5)
      .select(col("doc_id").as("orig_id"), col("n_removed").as("nr0"),
        col("clean_text").as("ct0"))
    val boilN = timedRun(s"boilerplate ${n}x") {
      graft.text.Boilerplate
        .stripFrequent(bigSrc, "doc_id", "text", "source",
          chunkWords = 2, minFrac = 0.05, minDocs = 5 * n)
    }
    val boilDrift = boilN
      .select((col("doc_id") / n).cast("long").as("orig_id"),
        col("n_removed"), col("clean_text"))
      .join(boil0, Seq("orig_id"))
      .filter(col("n_removed") =!= col("nr0") || col("clean_text") =!= col("ct0"))
      .count()
    require(boilDrift == 0, s"boilerplate drifted under ${n}x replication: $boilDrift rows")
    val boilCut = boil0.filter(col("nr0") > 0).count()
    require(boilCut > 0, "boilerplate probe cut nothing - the invariant held vacuously")
    println(s"SCALE boilerplate: $boilCut docs cut (drift 0)")

    // Inverted index at 20×: replicas contribute distinct doc ids, so
    // every term's df must be EXACTLY 20× its unreplicated df.
    val idx0 = graft.text.InvertedIndex.build(docs, "doc_id", "text")
      .select(col("term"), (col("df") * n).as("df20"))
    val idxN = time(s"invertedIndex ${n}x") {
      val d = graft.text.InvertedIndex.build(big, "doc_id", "text").select("term", "df")
      d.count() // materialize inside the timer (build is lazy)
      d
    }
    val idxDrift = idxN.join(idx0, Seq("term"), "full")
      .filter(col("df").isNull || col("df20").isNull || col("df") =!= col("df20")).count()
    require(idxDrift == 0, s"inverted-index df drifted under ${n}x replication: $idxDrift terms")
    println(s"SCALE inverted index: ${idx0.count()} terms (df drift 0)")

    val emb = Tables.table(spark, dir, "embeddings")
    val bigEmb = emb.crossJoin(spark.range(n).toDF("rep"))
      .select((col("vec_id") * n + col("rep")).as("vec_id"), col("embedding"))
    time(s"ann bruteforce over ${n}x corpus") {
      Ann.bruteForceTopK(bigEmb, bigEmb.filter(col("vec_id") < 3), "vec_id", "embedding", 5).count()
    }
    time(s"ann ivf over ${n}x corpus") {
      Ann.ivfTopK(bigEmb, bigEmb.filter(col("vec_id") < 3), "vec_id", "embedding", 64, 5,
        numCells = 64, nProbe = 4).count()
    }
    // PQ over the replicated corpus: training (3 Lloyd passes), encode,
    // ADC scan, and exact re-rank end-to-end on 100k vectors
    time(s"ann pq over ${n}x corpus") {
      Ann.pqTopK(bigEmb, bigEmb.filter(col("vec_id") < 3), "vec_id", "embedding", 64, 5).count()
    }
    // Composed IVFADC at 20×: both quantizer trainings + encode +
    // cell-pruned ADC scan + exact re-rank end-to-end, under the same
    // drift gate the dedup paths carry. Mass replication is the ANN
    // worst case — every vector ties with 19 identical twins, so any
    // nondeterministic tie-break or candidate loss in the composition
    // surfaces as a recall drop. Gate: every probe's top-5 must hit
    // >= 2 of the exact top-5 (the q_ann_ivfpq oracle bound), with
    // (score desc, vec_id) total orders on both sides.
    val probes20 = bigEmb.filter(pmod(col("vec_id"), lit(n)) === 0 && col("vec_id") < 3L * n)
    val exact20 = Ann.bruteForceTopK(bigEmb, probes20, "vec_id", "embedding", 5)
      .select(col("probe_id"), col("vec_id"))
    // NOT timedRun: ivfPqTopK trains both quantizers EAGERLY at plan
    // construction (bounded driver collects), so the timer must wrap
    // construction + execution or the training cost escapes it
    val approx20 = time(s"ann ivfpq over ${n}x corpus") {
      val d = Ann.ivfPqTopK(bigEmb, probes20, "vec_id", "embedding", 64, 5)
      d.write.mode("overwrite").format("noop").save()
      d
    }
    // Left-join from the probe set (the annRecallCheck shape): a probe
    // with ZERO approx hits must still produce a row — grouping only
    // semi-join survivors would render total candidate loss (the exact
    // failure mode this gate exists to catch) invisible.
    val hits20 = exact20
      .join(approx20.select(col("probe_id").as("p"), col("vec_id").as("v")),
        col("probe_id") === col("p") && col("vec_id") === col("v"), "left_semi")
      .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
    val lowRecall = probes20.select(col("vec_id").as("probe_id"))
      .join(hits20, Seq("probe_id"), "left")
      .filter(coalesce(col("n_hit"), lit(0L)) < 2).count()
    require(lowRecall == 0,
      s"ivfpq recall drifted under ${n}x replication: $lowRecall probes below 2/5")
    println(s"SCALE ivfpq recall: all probes >= 2/5 at ${n}x (drift 0)")

    // Record linkage under block skew: ONE block holds 50% of the
    // records (the shape the blocked self-join is worst at — every
    // giant-block candidate pair lands on one reducer). The salted
    // variant must produce the IDENTICAL pair set (the saltedJoin
    // oracle pattern) while spreading the giant block's verify.
    // 10k records, 5k in the giant block → ~12.5M in-block pairs, and
    // a 160-char compare field at maxDist 8 so the banded-DP verify
    // (not shuffle overhead) is the dominant cost the salt spreads —
    // the realistic record-linkage regime (address/description
    // fields), where one reducer owning the giant block binds
    val recs = docs.filter(col("doc_id") < 10000)
      .select(col("doc_id").as("rec_id"),
        substring(coalesce(col("text"), lit("")), 1, 160).as("name"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("giant"))
          .otherwise(concat(lit("b"), pmod(col("doc_id"), lit(64)).cast("string")))
          .as("blk"))
    // The salt lever exists for the SHUFFLE-join regime (at 100 TB the
    // record side is never broadcastable, the join hashes on the block
    // key, and one reducer owns the whole giant block). At probe bytes
    // Catalyst would broadcast the build side (no per-block reducer at
    // all) and AQE would coalesce the kilobyte salt buckets, so both
    // are pinned off during the timed section — for BOTH variants —
    // to measure the regime the lever is for.
    val broadcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevBroadcast = spark.conf.get(broadcastKey)
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(broadcastKey, "-1")
    spark.conf.set(coalesceKey, "false")
    val (linked0, linkedS) =
      try {
        (timedRun("linkage blocked, 50%-giant block") {
          graft.operators.Linkage.linkByEditDistance(
            recs, "rec_id", "name", Seq("blk"), maxDist = 8)
        },
        timedRun("linkage salted x32, same block skew") {
          graft.operators.Linkage.linkByEditDistance(
            recs, "rec_id", "name", Seq("blk"), maxDist = 8, salts = 32)
        })
      } finally {
        spark.conf.set(broadcastKey, prevBroadcast)
        spark.conf.set(coalesceKey, prevCoalesce)
      }
    val linkDrift = linkedS.unionAll(linked0)
      .groupBy("id_a", "id_b", "dist").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    require(linkDrift == 0,
      s"salted linkage pair set drifted from blocked: $linkDrift pairs")
    println(s"SCALE linkage: ${linked0.count()} pairs (salted drift 0)")

    // IVFADC maintenance at 20×: build on a quarter, append the other
    // three quarters through the frozen quantizers (each append
    // fragments every touched cell), then compact per cell. Answers
    // must be bit-identical across the compaction; the file count is
    // the number a daily-ingest deployment watches.
    val idxPath = java.nio.file.Files.createTempDirectory("scale_ivfpq").toString + "/idx"
    time(s"ivfpq index build+3 appends at ${n}x") {
      Ann.buildIvfPqIndex(bigEmb.filter(pmod(col("vec_id"), lit(4)) === 0),
        "vec_id", "embedding", 64, idxPath)
      for (r <- 1 to 3)
        Ann.appendToIvfPqIndex(idxPath,
          bigEmb.filter(pmod(col("vec_id"), lit(4)) === r), "vec_id", "embedding", 64)
    }
    def idxFiles(): Int = new java.io.File(idxPath).listFiles()
      .filter(_.getName.startsWith("cell="))
      .map(_.listFiles().count(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("."))).sum
    val probesIdx = bigEmb.filter(col("vec_id") < 3)
    def idxAnswers() = Ann.ivfPqTopKIndexed(idxPath, probesIdx,
        "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (filesBefore, ansBefore) = (idxFiles(), idxAnswers())
    val nCells = time(s"compactIvfIndex over ${filesBefore} files") {
      Ann.compactIvfIndex(spark, idxPath)
    }
    val filesAfter = idxFiles()
    require(filesAfter < filesBefore,
      s"compaction must shrink the file count: $filesBefore -> $filesAfter")
    require(idxAnswers() == ansBefore, "compaction changed an ANN answer")
    println(s"SCALE ivfpq compact: $filesBefore -> $filesAfter files across $nCells cells (answers stable)")

    // connected components on adversarial shapes: a single 200k-node
    // path (worst-case diameter — stresses the O(log²) round bound)
    // and 2k disjoint 100-node stars (wide shallow clusters)
    val path = spark.range(200000L - 1).toDF("s").select(col("s"), (col("s") + 1).as("d"))
    time("cc 200k-node path") {
      val comps = graft.operators.Components.connectedComponents(path, "s", "d")
      val distinctComps = comps.select("component").distinct().count()
      require(distinctComps == 1L, s"path must collapse to 1 component, got $distinctComps")
    }
    val stars = spark.range(200000L).toDF("i")
      .select((col("i") - col("i") % 100).as("s"), col("i").as("d"))
      .filter(col("s") =!= col("d"))
    time("cc 2k disjoint stars") {
      val comps = graft.operators.Components.connectedComponents(stars, "s", "d")
      val distinctComps = comps.select("component").distinct().count()
      require(distinctComps == 2000L, s"expected 2000 components, got $distinctComps")
    }

    // CDC steady state: 10 delta batches against a 1.5M-row table —
    // the merge-on-write shape where every batch pays one anti join +
    // full rewrite. The invariant is the replayed changelog: final
    // row count must equal base minus the keys whose LAST touch was
    // a delete (keys k % 97 == b are deleted in batch b, later
    // batches only ever re-upsert k % 31 == b).
    val cdcBase = spark.range(1500000L).toDF("k")
      .select(col("k"), (col("k") % 1000).as("v"))
    val cdcPath = java.nio.file.Files.createTempDirectory("scale_cdc").toString + "/t"
    graft.sinks.TableSink.writeTruncate(cdcBase, cdcPath)
    time("applyCdc 10 batches over 1.5M rows") {
      for (b <- 1 to 10) {
        val delta = cdcBase
          .filter(col("k") % 97 === b || col("k") % 31 === b)
          .select(col("k"), (col("v") + b).as("v"),
            when(col("k") % 97 === b && col("k") % 31 =!= b, "D")
              .otherwise("U").as("_op"))
        graft.sinks.TableSink.applyCdc(spark, cdcPath, delta, Seq("k"))
      }
    }
    val cdcGot = spark.read.parquet(cdcPath).count()
    // independent replay: last touch per key decides
    val lastTouch = cdcBase.select(col("k"),
      greatest((lit(0) +: (1 to 10).map(b =>
        when(col("k") % 97 === b || col("k") % 31 === b, b).otherwise(0))): _*).as("lb"))
    val deleted = lastTouch.filter(col("lb") > 0)
      .filter(col("k") % 97 === col("lb") && col("k") % 31 =!= col("lb")).count()
    require(cdcGot == 1500000L - deleted,
      s"CDC final count $cdcGot != ${1500000L - deleted} (replay)")
    println(s"SCALE applyCdc: 10 batches, final $cdcGot rows ($deleted deleted, drift 0)")

    // partition-tree compaction at width: 120 date leaves x 8
    // fragments each (the year of a daily ingest that wrote hourly
    // files), concurrent leaf jobs; invariant = per-leaf file count 1
    // and byte-exact row preservation.
    val cpPath = java.nio.file.Files.createTempDirectory("scale_cp").toString + "/t"
    val cpDf = spark.range(1200000L).toDF("i")
      .select(col("i"), (col("i") % 120).cast("string").as("day"))
    graft.sinks.TableSink.writeTruncate(cpDf.repartition(8), cpPath,
      partitionBy = Seq("day"))
    val cpRewritten = time("compactPartitioned 120 leaves x 8 files") {
      graft.sinks.TableSink.compactPartitioned(spark, cpPath)
    }
    require(cpRewritten == 120, s"expected 120 leaves compacted, got $cpRewritten")
    val cpSum = spark.read.parquet(cpPath).agg(sum("i")).head().getLong(0)
    require(cpSum == 1200000L * (1200000L - 1) / 2, s"row loss after compaction: $cpSum")
    println(s"SCALE compactPartitioned: 120 leaves -> 1 file each (sum invariant holds)")

    // Sweep (B63) at 5M intervals (10M endpoint deltas): the
    // segmented two-level prefix sum vs the sequential global-window
    // baseline it replaces — equality on every bucket peak is the
    // exactness invariant, the timing gap is the scale story.
    import org.apache.spark.sql.expressions.Window
    val sweepIv = spark.range(5000000L).toDF("i").select(
      ((col("i") * 2654435761L) % 86400000000L).as("s_us"),
      (((col("i") * 2654435761L) % 86400000000L) +
        1000000L + (col("i") % 3600000000L)).as("e_us"))
    val segPeaks = timedRun("sweep segmented 5M intervals") {
      graft.operators.Sweep.peakConcurrent(sweepIv, "s_us", "e_us", 3600000000L)
        .select("bucket", "peak")
    }
    val globalPeaks = timedRun("sweep GLOBAL-window baseline 5M intervals") {
      val d = sweepIv.select(col("s_us").as("t"), lit(1L).as("delta"))
        .unionAll(sweepIv.select(col("e_us").as("t"), lit(-1L).as("delta")))
      d.withColumn("rs", sum("delta").over(Window.orderBy("t", "delta")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(expr("t div 3600000000L").as("bucket"))
        .agg(max("rs").as("peak"))
    }
    val sweepDrift = segPeaks.unionAll(globalPeaks)
      .groupBy("bucket", "peak").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    require(sweepDrift == 0, s"sweep segmented vs global drift: $sweepDrift buckets")
    println("SCALE sweep: segmented == global on every bucket")

    // Rolling distinct (B64) at 10M activity rows over 50k entities x
    // 365 days: w=1 must equal the direct per-day distinct count, and
    // w=7 is spot-checked against direct window recomputes.
    val act = spark.range(10000000L).toDF("i").select(
      (col("i") % 50000L).as("e"),
      ((col("i") * 1103515245L + col("i") % 97) % 365L).as("d"))
    val r7 = timedRun("rollingDistinct w=7 10M rows") {
      graft.operators.Rolling.rollingDistinct(act, "e", "d", 7)
    }
    // approximate path (B79): same 10M rows, w=28 — the window width
    // the exact fan-out pays 4x for costs the sketch path only 4x
    // more per-day merges on the calendar-sized daily table. Band
    // check against exact w=28 on three spot days.
    val ra = timedRun("rollingDistinctApprox w=28 10M rows") {
      graft.operators.Rolling.rollingDistinctApprox(act, "e", "d", 28)
    }
    for (day <- Seq(27L, 180L, 364L)) {
      val e28 = act.filter(col("d").between(day - 27, day))
        .select("e").distinct().count()
      val a28 = ra.filter(col("day") === day).head().getLong(1)
      require(math.abs(a28 - e28) * 10 <= e28,
        s"approx w=28 day $day: $a28 vs exact $e28")
    }
    println("SCALE rolling approx: w=28 within 10% of exact on spot days")
    val r1 = graft.operators.Rolling.rollingDistinct(act, "e", "d", 1)
    val direct1 = act.groupBy(col("d").as("day"))
      .agg(countDistinct("e").as("n_distinct"))
    val r1Drift = r1.unionAll(direct1)
      .groupBy("day", "n_distinct").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    require(r1Drift == 0, s"rolling w=1 vs direct distinct drift: $r1Drift days")
    for (day <- Seq(6L, 100L, 364L)) {
      val want = act.filter(col("d").between(day - 6, day))
        .select("e").distinct().count()
      val got = r7.filter(col("day") === day).head().getLong(1)
      require(got == want, s"rolling w=7 day $day: $got != direct $want")
    }
    println("SCALE rolling: w=1 == direct; w=7 spot-checks hold")

    // Band lookup (B65): plan-embedded binary search at 20M rows x
    // 10k breaks, and assignment equality vs the BETWEEN
    // BroadcastNestedLoopJoin it replaces (BNLJ at 2M x 100 — the
    // baseline is already O(bands) per row, which is the point).
    val bands10k = Array.tabulate(10000)(i => i.toLong * 100000L)
    val facts20m = spark.range(20000000L).toDF("i")
      .select(((col("i") * 2654435761L) % 1000000000L).as("v"))
    timedRun("searchSorted 20M rows x 10k breaks") {
      facts20m.select(graft.functions.expressions
          .searchSortedLong(col("v"), bands10k).as("b"))
        .groupBy("b").agg(count(lit(1)).as("n"))
    }
    val bands100 = Array.tabulate(100)(i => i.toLong * 10000000L)
    val facts2m = spark.range(2000000L).toDF("i")
      .select(((col("i") * 2654435761L) % 1000000000L).as("v"))
    val viaSearch = facts2m.select(col("v"),
      graft.functions.expressions.searchSortedLong(col("v"), bands100)
        .cast("long").as("b"))
    val bandTable = spark.createDataFrame(
      (0 until 100).map(i => (bands100(i),
        if (i == 99) Long.MaxValue else bands100(i + 1), i.toLong + 1))
      ).toDF("lo", "hi", "b2")
    val viaJoin = timedRun("BETWEEN BNLJ baseline 2M rows x 100 bands") {
      facts2m.join(broadcast(bandTable),
        col("v") >= col("lo") && col("v") < col("hi"))
        .select(col("v"), col("b2"))
    }
    // duplicate v values make a row-level v-join fan out; per-band
    // count equality is the collision-safe assignment check
    val bandDrift = viaSearch.groupBy(col("b").as("band")).agg(count(lit(1)).as("n"))
      .unionAll(viaJoin.groupBy(col("b2").as("band")).agg(count(lit(1)).as("n")))
      .groupBy("band", "n").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    require(bandDrift == 0,
      s"searchSorted vs BETWEEN join per-band count drift: $bandDrift bands")
    println("SCALE band lookup: binary search == BETWEEN join per-band on 2M rows")

    // Weighted quantiles (B67) at 10M rows: with unit weights the
    // weighted definition must collapse to percentile_disc exactly.
    val wq = spark.range(10000000L).toDF("i")
      .select(((col("i") * 2654435761L) % 10000000L).as("v"), lit(1L).as("w"))
    val wqGot = time("weightedQuantiles 10M rows") {
      graft.operators.WeightedQuantile.weightedQuantiles(
          wq, "v", "w", Seq(250000L, 500000L, 900000L, 990000L), 100000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val wqWant = wq.agg(
      expr("percentile_disc(0.25) within group (order by v)").cast("long"),
      expr("percentile_disc(0.5) within group (order by v)").cast("long"),
      expr("percentile_disc(0.9) within group (order by v)").cast("long"),
      expr("percentile_disc(0.99) within group (order by v)").cast("long")).head()
    val wqPairs = Seq(250000L -> wqWant.getLong(0), 500000L -> wqWant.getLong(1),
      900000L -> wqWant.getLong(2), 990000L -> wqWant.getLong(3))
    wqPairs.foreach { case (ppm, want) =>
      require(wqGot(ppm) == want, s"weighted q$ppm: ${wqGot(ppm)} != disc $want")
    }
    println("SCALE weighted quantiles: unit-weight == percentile_disc at 4 ppms")

    // Adaptive salting (B72) under real skew: 10M probe rows with 30%
    // on ONE key, 100k-row build side. Full-table salting replicates
    // the whole build x32; adaptive replicates only the hot key's
    // build rows. Invariant: per-brandish rollup equal across plain /
    // full-salt / adaptive.
    // build is 2M rows — past the broadcast threshold, so all three
    // variants really pay a shuffle join and the skew is real
    val skewProbe = spark.range(10000000L).toDF("i").select(
      when(col("i") % 10 < 3, 500L)
        .otherwise((col("i") * 2654435761L) % 2000000L).as("k"),
      (col("i") % 1000L).as("w"))
    val skewBuild = spark.range(2000000L).toDF("bk")
      .select(col("bk"), (col("bk") % 97L).as("grp"))
    def rollup(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("grp").agg(count(lit(1)).as("n"), sum("w").as("sw"))
    val plainJ = timedRun("skew join UNSALTED 10M x 2M (1 hot key)") {
      rollup(skewProbe.join(skewBuild, col("k") === col("bk")))
    }
    val fullJ = timedRun("skew join FULL salt x16") {
      rollup(graft.operators.Skew.saltedJoin(
        skewProbe, skewBuild, "k", "bk", saltFactor = 16))
    }
    val adaptJ = timedRun("skew join ADAPTIVE salt x16 (hot only)") {
      rollup(graft.operators.Skew.adaptiveSaltedJoin(
        skewProbe, skewBuild, "k", "bk", saltFactor = 16, hotThreshold = 100000L))
    }
    val saltDrift = plainJ.unionAll(fullJ).unionAll(adaptJ)
      .groupBy("grp", "n", "sw").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 3).count()
    require(saltDrift == 0, s"salted rollups drifted on $saltDrift groups")
    println("SCALE adaptive salt: plain == full-salt == adaptive on every group")

    // Subtree rollup (B74) over a 1M-node 10-ary forest (depth 6):
    // conservation invariants — root subtrees partition the forest,
    // so root n_nodes sum to N and root sum_value to the global sum;
    // leaves (ids with no children in [1, N)) roll up exactly
    // themselves.
    val n10 = 1000000L
    val forest = spark.range(1L, n10 + 1).toDF("id").select(col("id"),
      when(col("id") >= 10L, expr("id div 10")).as("parent"),
      (col("id") % 1000L).as("value"))
    val roll = timedRun("subtreeRollup 1M nodes depth 6") {
      graft.operators.Graph.subtreeRollup(forest, "id", "parent", "value", maxDepth = 7)
    }
    val rootAgg = roll.filter(col("id") < 10L)
      .agg(sum("n_nodes").as("n"), sum("sum_value").as("s")).head()
    val wantSum = forest.agg(sum("value")).head().getLong(0)
    require(rootAgg.getLong(0) == n10 && rootAgg.getLong(1) == wantSum,
      s"root subtrees must partition the forest: ${rootAgg.getLong(0)}/$n10, " +
        s"${rootAgg.getLong(1)}/$wantSum")
    val badLeaves = roll
      .filter(col("id") * 10L > n10 && col("n_nodes") =!= 1L).count()
    require(badLeaves == 0, s"$badLeaves leaves with n_nodes != 1")
    println("SCALE subtree rollup: root partition + leaf invariants hold at 1M nodes")

    // Point-in-time join (B69) at 5M facts vs a 300k-interval SCD2
    // dimension (100k keys x 3 states): every fact must land in the
    // interval containing its timestamp — verified by re-deriving the
    // expected state arithmetically (intervals are [0,1000),
    // [1000,2000), [2000,open) per key, so state = min(ts div 1000, 2)).
    val pitDim = spark.range(100000L).toDF("k").select(col("k"),
        explode(sequence(lit(0L), lit(2L))).as("s"))
      .select(col("k"), concat(lit("st"), col("s")).as("state"),
        (col("s") * 1000L).as("valid_from"),
        when(col("s") < 2L, (col("s") + 1L) * 1000L).as("valid_to"))
    val pitFacts = spark.range(5000000L).toDF("i").select(col("i").as("fid"),
      (col("i") % 100000L).as("k"),
      ((col("i") * 2654435761L) % 3000L).as("ts"))
    val pitOut = timedRun("pitJoin 5M facts x 300k intervals") {
      graft.operators.Scd.pitJoin(pitFacts, pitDim, "k", "k", "ts", Seq("state"))
    }
    val pitBad = pitOut.filter(
      col("pit_state") =!= concat(lit("st"), least(expr("ts div 1000"), lit(2L)))).count()
    val pitNulls = pitOut.filter(col("pit_state").isNull).count()
    require(pitBad == 0 && pitNulls == 0,
      s"pitJoin state drift: $pitBad wrong, $pitNulls null")
    println("SCALE pit join: all 5M facts matched their covering interval")

    // Distributed rank (r14, the B65 break derivation) at 10M distinct
    // values: v = 3i + 1 makes the true rank i + 1 arithmetically
    // checkable per row — no serial reference needed — and proves the
    // percentile-boundary + prefix-offset decomposition exact when
    // every range partition holds ~300k rows.
    val rankIn = spark.range(10000000L).toDF("i")
      .select((col("i") * 3L + 1L).as("v"))
    val rankBad = time("distinctRanks 10M values") {
      graft.operators.Rank.distinctRanks(rankIn, "v", partitions = 32)
        .filter(col("rank") =!= (col("v") - 1L) / 3L + 1L).count()
    }
    require(rankBad == 0, s"distinctRanks drift at 10M: $rankBad wrong ranks")
    println("SCALE distinct ranks: 10M ranks exact across 32 ranges")

    // Constraint audit (B80) at 10M rows with ARITHMETICALLY known
    // violation counts: nulls on i%10==0, value 'bad' on i%100==7
    // (never null — 7%10 != 0), out-of-range every 1000th, key space
    // 5M (so unique violations = exactly 5M), FK dim = evens
    // (orphans = odd keys, two copies each).
    val audIn = spark.range(10000000L).toDF("i").select(
      (col("i") % 5000000L).as("k"),
      when(col("i") % 10L =!= 0L,
        when(col("i") % 100L === 7L, lit("bad")).otherwise(lit("ok"))).as("s"),
      when(col("i") % 1000L === 0L, lit(-5L)).otherwise(col("i") % 50L).as("x"))
    val audDim = spark.range(2500000L).toDF("d").select((col("d") * 2L).as("pk"))
    import graft.operators.Constraints._
    val audGot = time("constraint audit 10M rows x 5 constraints") {
      graft.operators.Constraints.audit(audIn, Seq(
        NotNull("s"), AcceptedValues("s", Seq("ok")), InRange("x", 0L, 49L),
        Unique(Seq("k")), RefIntegrity("k", audDim, "pk", broadcastDim = false)))
        .select(col("constraint"), col("violations"))
        .as[(String, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong)).collect().toMap
    }
    val audWant = Map(
      "not_null(s)" -> 1000000L,       // i % 10 == 0
      "accepted_values(s)" -> 100000L, // i % 100 == 7
      "in_range(x)" -> 10000L,         // i % 1000 == 0
      "unique(k)" -> 5000000L,         // each key seen exactly twice
      "ref_integrity(k)" -> 5000000L)  // odd keys, two copies each
    require(audGot == audWant, s"audit drift at 10M: got $audGot want $audWant")
    println("SCALE constraint audit: 10M-row counts exact on all constraints")

    // Triangle count (B55) with node ids ~1e9 — the exact regime the
    // r14 two-column ordering fix exists for: 200k disjoint triangles
    // offset far past any packable id domain must count EXACTLY 200k.
    val triOff = 1000000000L
    val triEdges = spark.range(200000L).toDF("t").select(
      explode(array(
        struct((col("t") * 3 + triOff).as("s"), (col("t") * 3 + 1 + triOff).as("d")),
        struct((col("t") * 3 + 1 + triOff).as("s"), (col("t") * 3 + 2 + triOff).as("d")),
        struct((col("t") * 3 + 2 + triOff).as("s"), (col("t") * 3 + triOff).as("d"))))
        .as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
    val triGot = time("triangles 200k cliques at ids ~1e9") {
      graft.operators.Graph.triangleCount(triEdges, "s", "d")
        .head().getLong(0)
    }
    require(triGot == 200000L, s"triangle count drift at 1e9 ids: $triGot")
    println("SCALE triangles: 200k exact at 1e9-range node ids")

    // Nearest as-of (B15c) at 5M facts vs 300k quotes (100k keys ×
    // times {0, 1000, 2000}): the expected match is pure arithmetic —
    // round ts to the nearest quote time, remainder 500 ties backward,
    // ts ≥ 2000 clamps to the last quote — so every row self-checks.
    val anDim = spark.range(100000L).toDF("kk").select(col("kk"),
        explode(sequence(lit(0L), lit(2L))).as("s"))
      .select(col("kk").as("rk"), (col("s") * 1000L).as("rt"))
    val anFacts = spark.range(5000000L).toDF("i").select(col("i").as("fid"),
      (col("i") % 100000L).as("k"),
      ((col("i") * 2654435761L) % 3000L).as("ts"))
    val anOut = timedRun("asofNearest 5M facts x 300k quotes") {
      graft.operators.AsOf.asofNearest(anFacts, anDim, "k", "rk", "ts", "rt",
        Seq("rt"), outPrefix = "m_")
    }
    val anWant = when(col("ts") % 1000L < 500L, expr("ts div 1000") * 1000L)
      .when(col("ts") % 1000L > 500L,
        least(lit(2000L), (expr("ts div 1000") + 1L) * 1000L))
      .otherwise(expr("ts div 1000") * 1000L)
    val anBad = anOut.filter(col("m_rt").isNull || col("m_rt") =!= anWant).count()
    require(anBad == 0, s"asofNearest drift at 5M: $anBad wrong matches")
    println("SCALE asof nearest: all 5M facts matched the arithmetic nearest quote")

    // Version-guarded upsert (A18) at 1.5M keys, three batches applied
    // OUT OF ORDER (v3 slice, then the full v1 backfill, then a v2
    // slice): the converged row is pure arithmetic per key.
    val upBase = s"${graft.Scratch.root(spark)}/scale_upver"
    def upBatch(filterMod: Option[Long], ver: Long) = {
      val all = spark.range(1500000L).toDF("k")
      filterMod.map(m => all.filter(col("k") % m === 0L)).getOrElse(all)
        .select(col("k"), (col("k") * 10L + ver).as("v"), lit(ver).as("ver"))
    }
    time("upsertVersioned 3 out-of-order batches over 1.5M keys") {
      graft.sinks.TableSink.upsertVersioned(spark, upBase, upBatch(Some(2L), 3L), Seq("k"), "ver")
      graft.sinks.TableSink.upsertVersioned(spark, upBase, upBatch(None, 1L), Seq("k"), "ver")
      graft.sinks.TableSink.upsertVersioned(spark, upBase, upBatch(Some(3L), 2L), Seq("k"), "ver")
    }
    val upGot = spark.read.parquet(upBase)
    val upWantVer = when(col("k") % 2L === 0L, 3L)
      .when(col("k") % 3L === 0L, 2L).otherwise(1L)
    val upBad = upGot.filter(col("ver") =!= upWantVer ||
      col("v") =!= col("k") * 10L + upWantVer).count()
    require(upGot.count() == 1500000L && upBad == 0,
      s"upsertVersioned LWW drift: ${upGot.count()} rows, $upBad wrong")
    println("SCALE versioned upsert: 1.5M keys converged LWW under out-of-order batches")

    // Grouped OLS (B83) at 10M rows / 1000 groups: y = 7x + g exactly
    // per group, so every decimal(38,0) sufficient-statistic path must
    // recover slope_scaled = 7e6 and intercept = g with zero drift.
    val olsIn = spark.range(10000000L).toDF("i").select(
      (col("i") % 1000L).as("g"),
      (col("i") / 1000L).cast("long").as("x"))
      .withColumn("y", col("x") * 7L + col("g"))
    val olsOut = timedRun("groupedOls 10M rows / 1000 groups") {
      graft.operators.Regression.groupedOls(olsIn, Seq("g"), "x", "y")
    }
    val olsBad = olsOut.filter(col("slope_scaled") =!= 7000000L ||
      col("intercept") =!= col("g") || col("n") =!= 10000L).count()
    require(olsBad == 0, s"groupedOls drift at 10M: $olsBad groups wrong")
    println("SCALE grouped OLS: 1000 exact fits recovered from 10M rows")

    // Grouped mode (B85) under a 9M-row hot key: the hot key must cost
    // one pair per distinct value, and the tie-break must stay exact.
    // hot: values v0..v9 each get exactly 900k rows -> all ten tied,
    // tie-break -> v0; cold keys exercise the join's small side.
    val modeIn = spark.range(9000045L).toDF("i").select(
      when(col("i") < 9000000L, lit("hot")).otherwise(concat(lit("c"), col("i") % 15L)).as("k"),
      when(col("i") < 9000000L,
          concat(lit("v"), expr("i % 10")))
        .otherwise(concat(lit("w"), col("i") % 2L)).as("v"))
    val modeOut = timedRun("groupedMode 9M-row hot key + 15 cold keys") {
      graft.operators.Mode.groupedMode(modeIn, Seq("k"), "v")
    }
    val hotRow = modeOut.filter(col("k") === "hot").collect()(0)
    require(hotRow.getString(1) == "v0" && hotRow.getLong(2) == 900000L,
      s"hot-key mode drift: $hotRow")
    println("SCALE grouped mode: hot key resolved from 10 pair rows")

    // Linear gap-fill (B84) at 10k keys x 1001-day spans (10M output
    // rows): endpoints (0,0) and (1000,1000) make every filled value
    // provably equal its position.
    val fillIn = spark.range(10000L).toDF("k").select(col("k"),
        explode(array(lit(0L), lit(1000L))).as("d"))
      .withColumn("v", col("d"))
    val fillOut = timedRun("linearFill 10k keys -> 10M filled rows") {
      graft.operators.Interpolate.linearFill(fillIn, Seq("k"), "d", "v")
    }
    val fillBad = fillOut.filter(col("v") =!= col("d")).count()
    require(fillBad == 0, s"linearFill drift at 10M rows: $fillBad wrong fills")
    println("SCALE linear fill: 10M interpolated values exact")

    // Streaming anomaly state machine (D15) at 10M events / 10k keys:
    // constant 1.00 history with a 100.00 spike at position 500 per key
    // -> exactly one flag per key (zero-variance history flags any
    // deviation; warm-up never flags).
    import spark.implicits._
    val anomIn = spark.range(10000000L).toDF("i").select(
        (col("i") % 10000L).as("user_id"),
        col("i").as("event_id"),
        expr("timestamp_micros((i div 10000) * 1000000)").as("ts"),
        lit("m").as("event_type"),
        when(expr("i div 10000") === 500L, 100.0).otherwise(1.0).as("value"))
      .as[graft.streaming.Event]
    val anomFlags = time("anomalyStream batch 10M events / 10k keys") {
      graft.streaming.EventStream.anomalyStream(anomIn)
        .filter(col("is_anomaly")).count()
    }
    require(anomFlags == 10000L, s"anomaly flag drift at 10M: $anomFlags flags")
    println("SCALE anomaly: exactly one spike flagged per key at 10M events")

    // Union coverage (B90) at 10M intervals / 100k keys, answer provable
    // per key: even keys chain (step 10 < width 15 -> ONE segment,
    // covered = 99*10 + 15 = 1005); odd keys gap (step 20 -> 100
    // segments, covered = 100*15 = 1500).
    val covIn = spark.range(10000000L).toDF("i").select(
        (col("i") % 100000L).as("k"), expr("i div 100000").as("j"))
      .withColumn("step", when(col("k") % 2 === 0, 10L).otherwise(20L))
      .select(col("k"), (col("j") * col("step")).as("s"),
        (col("j") * col("step") + 15L).as("e"))
    val covOut = timedRun("unionCoverage 10M intervals / 100k keys") {
      graft.operators.Intervals.unionCoverage(covIn, "k", "s", "e")
    }
    val covBad = covOut.filter(
      (col("k") % 2 === 0 && (col("covered") =!= 1005L || col("n_segments") =!= 1L)) ||
      (col("k") % 2 === 1 && (col("covered") =!= 1500L || col("n_segments") =!= 100L)) ||
      col("n_invalid") =!= 0L).count()
    require(covBad == 0, s"unionCoverage drift at 10M: $covBad keys wrong")
    println("SCALE union coverage: 100k keys exact under chain and gap regimes")

    // Per-group Gini (B91) at 10M rows / 100 groups: x_i = i over
    // 1..100000 has the closed form G = (n-1)/(3n) -> exactly
    // 333330 ppm under integral division.
    val giniIn = spark.range(10000000L).toDF("i").select(
      (col("i") % 100L).as("g"), expr("i div 100 + 1").as("v"), col("i").as("id"))
    val giniOut = timedRun("giniPpm 10M rows / 100 groups") {
      graft.operators.Concentration.giniPpm(giniIn, Seq("g"), "v", "id")
    }
    val giniBad = giniOut.filter(col("gini_ppm") =!= 333330L ||
      col("n") =!= 100000L).count()
    require(giniBad == 0, s"giniPpm drift at 10M: $giniBad groups wrong")
    println("SCALE gini: 100 groups recover the closed form exactly at 10M rows")

    // FIFO matching (B95) at 10M movements / 100k keys, closed form:
    // per key 70 buys of qty 10 at unit cost = lot index (0..69), then
    // 30 sells of qty 10 -> first 30 lots consumed in full:
    // cogs = 10 * (0+1+...+29) = 4350, matched 300, nothing unmatched.
    val fifoIn = spark.range(10000000L).toDF("i").select(
        (col("i") % 100000L).as("k"), expr("i div 100000").as("seq"))
      .select(col("k"), col("seq"), lit(10L).as("q"),
        (col("seq") >= 70L).as("is_out"),
        when(col("seq") < 70L, col("seq")).otherwise(0L).as("c"))
    val fifoOut = timedRun("fifoCogs 10M movements / 100k keys") {
      graft.operators.Fifo.fifoCogs(fifoIn, "k", "seq", "q", "is_out", "c")
    }
    val fifoBad = fifoOut.filter(col("cogs") =!= 4350L ||
      col("matched_qty") =!= 300L || col("unmatched_qty") =!= 0L).count()
    require(fifoBad == 0, s"fifo drift at 10M: $fifoBad keys wrong")
    println("SCALE fifo: 100k keys hit the closed-form cost basis at 10M movements")

    // Layered resolution (B98) at 2M intervals / 100k keys: per key a
    // base rule [0, 1000) and ~19 higher-priority overrides [50j, 50j+20)
    // -> per key: overrides win their spans, base resumes between them.
    val layerIn = spark.range(2000000L).toDF("i").select(
        (col("i") % 100000L).as("k"), expr("i div 100000").as("j"))
      .select(col("k"),
        when(col("j") === 0L, 0L).otherwise(col("j") * 50L).as("vf"),
        when(col("j") === 0L, 1000L).otherwise(col("j") * 50L + 20L).as("vt"),
        when(col("j") === 0L, 1L).otherwise(2L).as("prio"),
        col("j").as("tie"), (col("j") * 7L).as("v"))
    val layerOut = timedRun("effectiveIntervals 2M intervals / 100k keys") {
      graft.operators.Layers.effectiveIntervals(layerIn, "k", "vf", "vt",
        "prio", "tie", "v")
    }
    // per key: 19 override segments + 20 base segments (before, between,
    // after overrides: [0,50),[70,100),...,[920,950),[970,1000)) = 39
    val segCounts = layerOut.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("seg_end") - col("seg_start")).as("covered"))
    val layerBad = segCounts.filter(col("n") =!= 39L ||
      col("covered") =!= 1000L).count()
    require(layerBad == 0, s"layers drift at 2M: $layerBad keys wrong")
    println("SCALE layers: 100k keys resolve to exactly 39 segments covering 1000")

    // CDC chunking (C67) under the same 20x replication: chunk
    // boundaries are a pure function of content, so all 20 replicas of
    // a doc MUST produce byte-identical chunk multisets — any drift
    // means the rolling hash picked up per-partition or per-replica
    // state. Gate: per original doc, exactly ONE distinct
    // (n_chunks, multiset-hash, min, max) signature across replicas.
    val chunkSig = timedRun(s"cdcChunks ${n}x corpus") {
      big.select(col("doc_id"),
          explode(graft.functions.expressions.cdcChunks(col("text")))
            .as("chunk"))
        .groupBy("doc_id")
        // multiset hash: mod the 64-bit hashes into [0, 1e9+7) before
        // summing — a raw xxhash64 sum overflows long under ANSI
        .agg(count(lit(1)).as("nc"),
          sum(pmod(xxhash64(col("chunk")), lit(1000000007L))).as("mh"),
          min("chunk").as("mn"), max("chunk").as("mx"))
    }
    val chunkDrift = chunkSig
      .groupBy(expr(s"doc_id div $n").as("orig"))
      .agg(countDistinct(struct(col("nc"), col("mh"), col("mn"), col("mx")))
        .as("sigs"), count(lit(1)).as("reps"))
      .filter(col("sigs") =!= 1L || col("reps") =!= n.toLong).count()
    require(chunkDrift == 0,
      s"cdc chunking drifted under ${n}x replication: $chunkDrift docs")
    println(s"SCALE cdc: every doc's $n replicas chunk identically")

    // CUSUM closed form (B103) at 10M points / 100k keys: per key 100
    // points at ref level for 50 steps then ref+40 for 50 steps
    // (slack 10, h 500). Closed form: S stays 0 through the flat half,
    // then climbs 30/step (S(o) = 30·(o−49)) -> first alarm at o=66
    // (S=510), 34 alarm points, max 1500. Any drift breaks the
    // prefix-min identity under real partitioning.
    val cusumIn = spark.range(10000000L).toDF("i").select(
        (col("i") % 100000L).as("k"), expr("i div 100000").as("o"))
      .select(col("k"), col("o"),
        when(col("o") < 50L, 100L).otherwise(140L).as("x"),
        lit(100L).as("ref"), lit(10L).as("slack"), lit(500L).as("h"))
    val cusumOut = timedRun("cusumAlarms 10M points / 100k keys") {
      graft.operators.Balance.cusumAlarms(cusumIn, "k", "o", "x",
        "ref", "slack", "h")
    }
    val cusumBad = cusumOut.filter(col("max_cusum") =!= 1500L ||
      col("n_alarm") =!= 34L || col("first_alarm_ord") =!= 66L).count()
    require(cusumBad == 0, s"cusum drift at 10M: $cusumBad keys wrong")
    println("SCALE cusum: 100k keys hit the closed-form alarm profile at 10M points")

    // Critical path (B113) on the ×2/×3 DAG over 1..2M: ~1.67M edges,
    // longest chain = log₂(2M) = 20 → the improvement-only relaxation
    // must converge in ~21 rounds, never node-count rounds. Closed
    // form at pure powers of two: the only path into 2^k is
    // 1→2→…→2^k, so critical_len(2^k) = Σ_{i=1..k} (2^i mod 7 + 1).
    val nCp = 2000000L
    val cpKeys = spark.range(1L, nCp + 1L).toDF("n")
    def cpEdges(k: Int) = cpKeys.filter(col("n") % k === 0L)
      .select(expr(s"n div $k").as("u"), col("n").as("v"),
        (col("n") % 7L + 1L).as("w"))
    val cp = timedRun("criticalPath 2M-node DAG") {
      graft.operators.Graph.criticalPath(
        cpEdges(2).unionByName(cpEdges(3)), "u", "v", "w")
    }
    val pow2Want = (1 to 20).scanLeft((1L, 0L)) { case ((node, len), i) =>
      val v = 1L << i; (v, len + (v % 7L) + 1L)
    }.drop(1).toMap
    val pow2Got = cp.filter(col("id").isin(pow2Want.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(pow2Got == pow2Want,
      s"criticalPath drift at 2M: ${pow2Got.toSeq.sorted} vs ${pow2Want.toSeq.sorted}")
    println("SCALE criticalPath: 2M-node DAG matches the power-of-two closed form")

    // Cycle census (B114) via pointer doubling at 4M nodes (22 rounds
    // of self-joins, never a step walk). Verified honestly: each
    // reported cycle is re-walked step-by-step DRIVER-SIDE from its
    // min member (rho cycles are ~√M-sized — driver-walkable) and must
    // return in exactly `size` steps with `cycle_id` as its min.
    val mCyc = 4000000L
    val cycNext = spark.range(0L, mCyc).toDF("id")
      .select(col("id"), ((col("id") * col("id") + 1L) % mCyc).as("nxt"))
    val cyc = timedRun("cycleStats 4M-node functional graph") {
      graft.operators.Graph.cycleStats(cycNext, "id", "nxt")
    }
    val cycles = cyc.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    require(cycles.nonEmpty, "cycleStats found no cycle (impossible: finite functional graph)")
    cycles.foreach { case (c, size) =>
      var (v, steps, mn) = ((c * c + 1L) % mCyc, 1L, c)
      while (v != c && steps <= size) { mn = math.min(mn, v); v = (v * v + 1L) % mCyc; steps += 1 }
      require(v == c && steps == size && mn == c,
        s"cycleStats drift: cycle $c size $size re-walk gave steps=$steps min=$mn")
    }
    println(s"SCALE cycleStats: ${cycles.size} cycles re-walked exactly " +
      s"(sizes ${cycles.map(_._2).sorted.mkString(",")})")

    // Live concurrency decomposition (D25) at 10M intervals / 25 hour
    // buckets: s = (i mod 86400) seconds over 116 replicas, len 30 min.
    // Closed form: each second holds exactly 116 starts, a bucket's
    // peak window covers 1800 seconds → 208,800 for buckets 0..23; the
    // spill bucket 24 peaks at its start instant with 1799 residues.
    val nConc = 86400L * 116L
    val concIn = spark.range(nConc).toDF("i")
      .select(timestamp_micros((col("i") % 86400L) * 1000000L).as("ts"))
    val conc = timedRun("concurrencyStream batch 10M intervals") {
      graft.streaming.EventStream.concurrencyStream(
        concIn, "ts", 1800L * 1000000L, 3600L * 1000000L).toDF()
    }
    val concGot = conc.collect().map(p => p.getLong(0) -> p.getLong(1)).toMap
    require(concGot.size == 25, s"expected 25 buckets, got ${concGot.size}")
    (0 to 23).foreach { b => require(concGot(b.toLong) == 208800L,
      s"bucket $b peak ${concGot(b.toLong)} != 208800") }
    require(concGot(24L) == 1799L * 116L,
      s"spill bucket peak ${concGot(24L)} != ${1799L * 116L}")
    println("SCALE concurrency: 10M-interval decomposition hits the closed-form peaks")

    // --- PCA moment pass under replication (r15): replicating every
    // vector k× must scale each exact moment EXACTLY k× — G' = kG,
    // s' = ks, n' = kn (integers, zero tolerance) — and the derived
    // covariance/eigenbasis is then bit-identical, so the whole fit
    // is replication-invariant by construction. Also times the
    // aggregate on 20× the corpus (40k × 64 dims here).
    val embs = Tables.table(spark, dir, "embeddings")
    val embBig = embs.crossJoin(spark.range(20).toDF("rep"))
      .select(col("embedding"))
    val (g1, s1, n1) = graft.similarity.Pca.gramStats(embs, "embedding", 64)
    val (g20, s20, n20) = time("pca gramStats 20x") {
      graft.similarity.Pca.gramStats(embBig, "embedding", 64)
    }
    require(n20 == 20L * n1, s"pca n drifted: $n20 != ${20L * n1}")
    require(g20.zip(g1).forall { case (a, b) => a == 20L * b },
      "pca second moments drifted under 20x replication")
    require(s20.zip(s1).forall { case (a, b) => a == 20L * b },
      "pca first moments drifted under 20x replication")
    println("SCALE pca: every exact moment scales 20x to the integer")

    // --- BPE trainer under replication (r15): replicating every doc
    // k× multiplies every word frequency k× and leaves the vocabulary
    // identical, so the learned merge TABLE must be identical with
    // every weighted count exactly k× — any drift is a determinism
    // bug in the round loop (tie-break, count formula, or fold).
    val bpeBase = graft.text.Bpe.learnMerges(docs, "text", 4)
    val bpeBig = time("bpe learnMerges 20x") {
      graft.text.Bpe.learnMerges(
        docs.crossJoin(spark.range(20).toDF("rep")).select(col("text")), "text", 4)
    }
    require(bpeBase.map(_._1) == bpeBig.map(_._1),
      s"bpe merges drifted under 20x replication: $bpeBase vs $bpeBig")
    require(bpeBase.map(_._3 * 20L) == bpeBig.map(_._3),
      s"bpe counts not exactly 20x: $bpeBase vs $bpeBig")
    println("SCALE bpe: merge table identical, counts exactly 20x")

    // --- Graph frontier under a power-law hub (VERDICT r15 #7): BFS
    // expands the frontier through a (frontier ⋈ edges) equi-join
    // keyed by node. Two regimes: a SMALL frontier broadcasts (no
    // skew possible — the hub's edges stay where they sit); once the
    // frontier outgrows the broadcast threshold the join shuffles on
    // the node key and a hub concentrates deg(hub) rows on ONE
    // reducer. The mechanism there is AQE's skew-join split
    // (OptimizeSkewedJoin) — this probe FORCES the shuffle regime
    // (broadcast off, emulating the at-scale frontier) with a planted
    // 2M-edge hub, scales the AQE skew thresholds down in the same
    // proportion the probe scales the data down from production
    // (deployment note in Graph.shortestPaths), and asserts with a
    // task listener that no task read the hub's whole edge block.
    {
      val hubDeg = 2000000L
      val others = 500000L
      val edges = spark.range(hubDeg).toDF("i")
        .select(lit(0L).as("a"), (col("i") + 10000000L).as("b"))
        .unionAll(spark.range(1L, others + 1L).toDF("i")
          .select(col("i").as("a"), (col("i") + 20000000L).as("b")))
      val sources = spark.range(0L, others + 1L).toDF("node")
      val maxTask = new java.util.concurrent.atomic.AtomicLong(0L)
      val lst = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            val r = m.shuffleReadMetrics.recordsRead
            var cur = maxTask.get()
            while (r > cur && !maxTask.compareAndSet(cur, r)) cur = maxTask.get()
          }
        }
      }
      def conf(k: String): Option[String] =
        scala.util.Try(spark.conf.get(k)).toOption
      val saved = Seq(
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes").map(k => k -> conf(k))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      spark.sparkContext.addSparkListener(lst)
      val sp = try {
        timedRun(s"bfs frontier with ${hubDeg / 1000000}M-edge hub, shuffle regime") {
          graft.operators.Graph.shortestPaths(
            edges, "a", "b", sources, "node", maxHops = 1)
        }
      } finally {
        spark.sparkContext.removeSparkListener(lst)
        saved.foreach { case (k, v) =>
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      }
      // closed form: sources settle at 0; every edge target at 1
      val byDist = sp.groupBy("dist").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      require(byDist == Map(0L -> (others + 1L), 1L -> (hubDeg + others)),
        s"bfs hub closed form drifted: $byDist")
      // the hub's edge block was SPLIT: no task read even half of it
      require(maxTask.get() < hubDeg / 2,
        s"frontier hub landed on one reducer: max task read ${maxTask.get()} " +
          s"records of a $hubDeg-edge hub — AQE skew split did not engage")
      println(s"SCALE bfs hub: AQE split the hub block (max task read " +
        s"${maxTask.get()} of $hubDeg hub edges)")
    }

    // B124 skyline at 2M rows (r16): the bucket decomposition must
    // hold its closed forms at scale — a staircase (x=i, y=i: NOTHING
    // dominated, the worst case for frontier size), a plateau
    // (1000 duplicates per x, y cycling: exactly ONE survivor — the
    // global (0, 999) point dominates every other row incl. its
    // same-x peers), and a per-bucket-max comb (frontier = exactly
    // the top-y row of each of the n/k x-values). Frontier SIZE and
    // MEMBERSHIP are both gated; wall time printed.
    {
      import org.apache.spark.sql.functions.{expr, lit}
      val n = 2000000L
      val k = 1000L
      val ids = spark.range(n)
      def frontier(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Skyline.frontier(df, Seq("g"), "x", "y", 64)
      time("skyline 2M staircase (all survive)") {
        val stairs = ids.select(lit("s").as("g"),
          col("id").as("x"), col("id").as("y"))
        val c = frontier(stairs).count()
        require(c == n, s"skyline staircase drifted: $c of $n survived")
      }
      time("skyline 2M plateau (one survivor)") {
        val plateau = ids.select(lit("p").as("g"),
          expr("id div 1000").as("x"), expr("id % 1000").as("y"))
        val rows = frontier(plateau).select("x", "y")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        require(rows == Set((0L, 999L)),
          s"skyline plateau drifted: ${rows.size} survivors ${rows.take(5)}")
      }
      time("skyline 2M comb (one per x)") {
        val comb = ids.select(lit("c").as("g"),
          expr("id div 1000").as("x"),
          expr("id div 1000 + id % 1000").as("y"))
        val f = frontier(comb)
        val c = f.count()
        require(c == n / k, s"skyline comb drifted: $c of ${n / k}")
        val bad = f.filter(expr("y != x + 999")).count()
        require(bad == 0L, s"skyline comb kept $bad non-top rows")
      }
    }

    // A38 row-level three-way merge at 5M keys (r16): the full branch
    // lifecycle through the real snapshot namespace — branch updates
    // the k%3==0 class (+1) and deletes the k%21==2 class, target
    // updates k%3==1 (+100) and inserts a 1000-key block; provably
    // disjoint change sets (21m+2 ≡ 2 mod 3), so the merge must be
    // conflict-free and land exactly on the closed-form class counts.
    {
      import org.apache.spark.sql.functions.{col, expr, lit}
      val n = 5000000L
      val root = s"${Scratch.root(spark)}/probe_rowmerge"
      val base = spark.range(n).select(col("id").as("k"), col("id").as("v"))
      time("row merge 5M: publish base + branch + two edits") {
        graft.sinks.Snapshot.publish(spark, root, Map("t" -> base))
        graft.sinks.Snapshot.tag(spark, root, "prod", 1L)
        graft.sinks.Snapshot.branch(spark, root, "dev", "prod")
        val branchT = base.filter(!(col("k") % 21 === 2))
          .withColumn("v", expr("CASE WHEN k % 3 = 0 THEN v + 1 ELSE v END"))
        graft.sinks.Snapshot.publishToRef(spark, root, "dev", Map("t" -> branchT))
        val targetT = base
          .withColumn("v", expr("CASE WHEN k % 3 = 1 THEN v + 100 ELSE v END"))
          .unionAll(spark.range(n, n + 1000)
            .select(col("id").as("k"), (col("id") + 7L).as("v")))
        graft.sinks.Snapshot.publishToRef(spark, root, "prod", Map("t" -> targetT))
      }
      time("row merge 5M: three-way keyed merge") {
        graft.sinks.Snapshot.mergeRefRows(spark, root, "dev", "prod",
          Map("t" -> Seq("k")))
      }
      val merged = graft.sinks.Snapshot.readTag(spark, root, "t", "prod")
      val stats = merged.select(
          expr("count(1)").as("n"),
          expr("sum(CASE WHEN k < " + n + " AND v = k + 1 THEN 1 ELSE 0 END)").as("b"),
          expr("sum(CASE WHEN k < " + n + " AND v = k + 100 THEN 1 ELSE 0 END)").as("t"),
          expr("sum(CASE WHEN k >= " + n + " THEN 1 ELSE 0 END)").as("ins"))
        .head()
      val deleted = (0L until n).count(_ % 21 == 2) // 238095-ish, exact
      val branchUpd = (0L until n).count(k => k % 3 == 0 && k % 21 != 2)
      val targetUpd = (0L until n).count(_ % 3 == 1)
      require(stats.getLong(0) == n - deleted + 1000,
        s"row merge 5M: count ${stats.getLong(0)} != ${n - deleted + 1000}")
      require(stats.getLong(1) == branchUpd && stats.getLong(2) == targetUpd
        && stats.getLong(3) == 1000L,
        s"row merge 5M: class counts ${stats.toSeq} != ($branchUpd, $targetUpd, 1000)")
      println(s"SCALE row merge 5M: closed-form classes hold " +
        s"(${n - deleted + 1000} rows, $branchUpd branch-updated, $targetUpd target-updated)")
    }
    spark.stop()
  }
}
