package graft

import graft.dedup.Dedup
import graft.similarity.Ann
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
           math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(42)
    (0L until 100L).map(i => (i, Array.fill(32)(rnd.nextGaussian().toFloat)))
  }
  private lazy val df = vecs.toDF("vec_id", "embedding")

  test("bruteForceTopK matches a driver-side exact computation") {
    val probes = df.filter($"vec_id" < 2)
    val got = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (p <- 0L until 2L) {
      val pv = vecs(p.toInt)._2
      val expected = vecs.filter(_._1 != p)
        .map { case (id, v) => (id, cos(pv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1)
      val gotIds = (1 to 5).map(r => got((p, r.toLong)))
      assert(gotIds == expected, s"probe $p")
    }
  }

  test("ivfTopK returns correctly-ranked subset with adequate recall") {
    val probes = df.filter($"vec_id" < 10)
    val brute = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.ivfTopK(df, probes, "vec_id", "embedding", 32, 5,
      numCells = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"ivf recall@5 = $recall")
  }

  test("nearestCentroids handles zero vectors without NaN") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val centroids = Array(1.0, 0.0, 0.0, 0.0) // two 2-dim centroids; second is zero
    val zeroProbe = new GenericArrayData(Array(0.0, 0.0))
    val cells = graft.functions.HashOps.nearestCentroids(zeroProbe, centroids, 2, 2, isFloat = false)
    assert(cells.toSeq == Seq(0, 1), "zero probe must fall back to similarity 0, index order")
    val realProbe = new GenericArrayData(Array(1.0, 1.0))
    val cells2 = graft.functions.HashOps.nearestCentroids(realProbe, centroids, 2, 2, isFloat = false)
    assert(cells2.head == 0, "real probe vs zero centroid must rank the nonzero centroid first")
  }

  test("lshTopK returns correctly-ranked subset with adequate recall") {
    val probes = df.filter($"vec_id" < 10)
    val brute = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = Ann.lshTopK(df, probes, "vec_id", "embedding", 32, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect approx).size.toDouble / brute.size
    assert(recall >= 0.3, s"recall@5 = $recall") // bucketed candidates only
    // within-bucket ranking must still be by true cosine
    val ranks = Ann.lshTopK(df, probes, "vec_id", "embedding", 32, 5)
      .groupBy("probe_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
      .collect()
    ranks.foreach(r => assert(r.getLong(1) == r.getLong(2))) // ranks dense 1..n
  }

  // 8 well-separated clusters x 40 points in 16 dims: the regime where
  // trained centroids matter (sampled-by-id centroids may all land in
  // the same few clusters)
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian() * 5))
    (0L until 320L).map { i =>
      val c = centers((i % 8).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.3).toFloat))
    }
  }
  private lazy val clusteredDf = clustered.toDF("vec_id", "embedding")

  test("k-means-trained IVF beats untrained sampling on clustered data") {
    val probes = clusteredDf.filter($"vec_id" < 8)
    val brute = Ann.bruteForceTopK(clusteredDf, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recallWith(iters: Int): Double = {
      val got = Ann.ivfTopK(clusteredDf, probes, "vec_id", "embedding", 16, 5,
        numCells = 8, nProbe = 1, kmeansIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val trained = recallWith(5)
    val untrained = recallWith(0)
    assert(trained >= 0.9, s"trained recall@5 = $trained")
    assert(trained >= untrained - 0.05,
      s"training must not hurt: trained=$trained untrained=$untrained")
  }

  test("persisted IVF index prunes to probe cells and keeps recall") {
    val path = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Ann.buildIvfIndex(clusteredDf, "vec_id", "embedding", 16, path,
      numCells = 8, kmeansIters = 5)
    val probes = clusteredDf.filter($"vec_id" < 8)
    val result = Ann.ivfTopKIndexed(path, probes, "vec_id", "embedding", 16, 5, nProbe = 1)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"index scan must prune on the cell partition column:\n$plan")
    val brute = Ann.bruteForceTopK(clusteredDf, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = result.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.9, s"indexed recall@5 = $recall")
    // ranks stay dense 1..n per probe after the partition-pruned read
    result.groupBy("probe_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
      .collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("pqEncode emits m codes in [0, ks); reconstruction tracks block magnitudes") {
    val cb = Ann.trainPqCodebooks(df, "vec_id", "embedding", 32, m = 4, ks = 8, iters = 3)
    assert(cb.length == 4 * 8 * 8)
    val codes = df.select(col("vec_id"),
        graft.functions.expressions.pqEncode(col("embedding"), cb, 4, 8).as("codes"))
      .as[(Long, Seq[Int])].collect()
    assert(codes.length == 100)
    codes.foreach { case (id, cs) =>
      assert(cs.length == 4, s"vec $id: ${cs.length} codes")
      assert(cs.forall(c => c >= 0 && c < 8), s"vec $id codes out of range: $cs")
    }
    // the code table must actually use multiple centroids per block
    assert(codes.map(_._2.head).distinct.length > 1, "block 0 collapsed to one code")
  }

  test("pqTopK: ADC shortlist + exact re-rank reaches high recall, exact top ranks") {
    val probes = df.filter($"vec_id" < 10)
    val brute = Ann.bruteForceTopK(df, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Ann.pqTopK(df, probes, "vec_id", "embedding", 32, 5, m = 4, ks = 16)
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect gotSet).size.toDouble / brute.size
    // exact re-rank over a 32-wide ADC shortlist of a 100-vector corpus
    assert(recall >= 0.7, s"pq recall@5 = $recall")
    // ranks dense 1..n per probe; scores are TRUE cosines after re-rank
    got.groupBy("probe_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
      .collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
    val scored = got.collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    scored.foreach { case ((p, v), s) =>
      val expect = cos(vecs(p.toInt)._2, vecs(v.toInt)._2)
      assert(math.abs(s - expect) < 1e-9, s"($p,$v): rerank score $s vs exact $expect")
    }
  }

  test("ivfPqTopK: cell-pruned ADC scan + exact re-rank keeps recall on clustered data") {
    val probes = clusteredDf.filter($"vec_id" < 8)
    val brute = Ann.bruteForceTopK(clusteredDf, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = Ann.ivfPqTopK(clusteredDf, probes, "vec_id", "embedding", 16, 5,
      numCells = 8, nProbe = 2, kmeansIters = 5, m = 4, ks = 8)
    val gotSet = got.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect gotSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"ivfadc recall@5 = $recall")
    // ranks dense 1..n per probe; scores are true cosines post re-rank
    got.groupBy("probe_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
      .collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("appendToIvfIndex: appended vectors are findable through the frozen quantizer") {
    val path = java.nio.file.Files.createTempDirectory("ivf_app").toString
    val first = clusteredDf.filter($"vec_id" < 32)
    val rest = clusteredDf.filter($"vec_id" >= 32)
    Ann.buildIvfIndex(first, "vec_id", "embedding", 16, path,
      numCells = 8, kmeansIters = 5)
    Ann.appendToIvfIndex(path, rest, "vec_id", "embedding", 16)
    val probes = clusteredDf.filter($"vec_id" < 8)
    val got = Ann.ivfTopKIndexed(path, probes, "vec_id", "embedding", 16, 5, nProbe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val brute = Ann.bruteForceTopK(clusteredDf, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect got).size.toDouble / brute.size
    assert(recall >= 0.9, s"post-append recall@5 = $recall")
    // results MUST include appended ids (the clusters span both halves)
    assert(got.exists(_._2 >= 32L), s"no appended vector ever returned: $got")
  }

  test("persisted IVFADC index: pruned code-only ADC scan, recall, frozen append") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    val half = clusteredDf.filter($"vec_id" < 32)
    val rest = clusteredDf.filter($"vec_id" >= 32)
    Ann.buildIvfPqIndex(half, "vec_id", "embedding", 16, path,
      numCells = 8, kmeansIters = 5, m = 4, ks = 8)
    Ann.appendToIvfPqIndex(path, rest, "vec_id", "embedding", 16)
    val probes = clusteredDf.filter($"vec_id" < 8)
    val result = Ann.ivfPqTopKIndexed(path, probes, "vec_id", "embedding", 16, 5,
      nProbe = 2)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"index scans must prune on the cell partition column:\n$plan")
    val brute = Ann.bruteForceTopK(clusteredDf, probes, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = result.collect()
    val gotSet = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect gotSet).size.toDouble / brute.size
    assert(recall >= 0.8, s"indexed ivfadc recall@5 = $recall")
    // appended ids must surface through the FROZEN quantizers
    assert(gotSet.exists(_._2 >= 32L), s"no appended vector ever returned: $gotSet")
    // ranks dense 1..n per probe; scores are true cosines post re-rank
    result.groupBy("probe_id").agg(max("rank").as("mr"), count(lit(1)).as("n"))
      .collect().foreach(r => assert(r.getLong(1) == r.getLong(2)))
    got.foreach { r =>
      assert(r.getDouble(3) <= 1.0 + 1e-9 && r.getDouble(3) >= -1.0 - 1e-9)
    }
    // the stored layout is a SUPERSET of the plain IVF index: the
    // uncompressed query path must run unchanged against it with the
    // same recall (the migration story between the two index kinds)
    val plain = Ann.ivfTopKIndexed(path, probes, "vec_id", "embedding", 16, 5,
        nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val plainRecall = (brute intersect plain).size.toDouble / brute.size
    assert(plainRecall >= 0.8, s"plain query over IVFADC index: recall $plainRecall")
  }

  test("compactIvfIndex merges append fragments; answers and sidecars unchanged") {
    val path = java.nio.file.Files.createTempDirectory("ivfpq_cmp").toString
    Ann.buildIvfPqIndex(clusteredDf.filter($"vec_id" < 16), "vec_id", "embedding",
      16, path, numCells = 8, kmeansIters = 5, m = 4, ks = 8)
    // three increments fragment every touched cell partition
    for (lo <- Seq(16L, 32L, 48L))
      Ann.appendToIvfPqIndex(path,
        clusteredDf.filter($"vec_id" >= lo && $"vec_id" < lo + 16), "vec_id", "embedding", 16)
    def cellFiles(): Map[String, Int] =
      new java.io.File(path).listFiles().filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().count(f =>
          f.getName.endsWith(".parquet") && !f.getName.startsWith("."))).toMap
    val probes = clusteredDf.filter($"vec_id" < 8)
    def answers() = Ann.ivfPqTopKIndexed(path, probes, "vec_id", "embedding", 16, 5,
        nProbe = 2).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (filesBefore, ansBefore) = (cellFiles(), answers())
    assert(filesBefore.values.sum > filesBefore.size,
      s"appends should have fragmented at least one cell: $filesBefore")
    val nCells = Ann.compactIvfIndex(spark, path, targetFileBytes = 64L * 1024 * 1024)
    assert(nCells == filesBefore.size, "every cell partition must be examined")
    val filesAfter = cellFiles()
    assert(filesAfter.keySet == filesBefore.keySet, "compaction must not move cells")
    assert(filesAfter.values.forall(_ == 1),
      s"tiny cells must compact to one file each: $filesAfter")
    assert(filesAfter.values.sum < filesBefore.values.sum, "file count must shrink")
    assert(answers() == ansBefore, "compaction must not change any answer")
    // quantizer sidecars untouched
    assert(new java.io.File(path, "_graft_centroids").exists())
    assert(new java.io.File(path, "_graft_codebooks").exists())
    // no leftover swap siblings from the per-cell rename protocol
    assert(!new java.io.File(path).listFiles().exists(_.getName.contains("__compact")),
      "compaction must clean up its tmp/bak siblings")
  }

  test("mmrRerank diversifies: an exact duplicate of the first pick loses to a farther distinct vector") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(0f, 0f)),   // probe
      (1L, Array(1f, 0f)),   // nearest
      (2L, Array(1f, 0f)),   // exact duplicate of 1 — zero separation
      (3L, Array(0f, 2f)))   // farther but distinct
      .toDF("vec_id", "embedding")
    val got = Ann.mmrRerank(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", poolK = 3, selectK = 2)
      .orderBy("sel_rank")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // pick 1: nearest, id tie-break → 1 (dq = 1e12); pick 2: the dup's
    // gain is 0 − 1e12, vector 3's is d(3,1) − dq(3) = 5e12 − 4e12
    assert(got.map(_._2) == Seq(1L, 3L))
    assert(got.head._3 == 1000000L * 1000000L)
    assert(got.head._4.isEmpty && got(1)._4.contains(1000000000000L))
  }

  test("mmrRerank first pick ties break to the smaller id and pool bounds hold") {
    import spark.implicits._
    val vecs = Seq(
      (9L, Array(0f)), (5L, Array(1f)), (4L, Array(1f)), (7L, Array(3f)))
      .toDF("vec_id", "embedding")
    val got = Ann.mmrRerank(vecs, vecs.filter($"vec_id" === 9L),
        "vec_id", "embedding", poolK = 2, selectK = 2)
      .orderBy("sel_rank")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // pool of 2 = {4, 5} (equal dq, id ties); 7 is outside the pool
    assert(got.map(_._2) == Seq(4L, 5L))
    intercept[IllegalArgumentException] {
      Ann.mmrRerank(vecs, vecs.filter($"vec_id" === 9L),
        "vec_id", "embedding", poolK = 1, selectK = 2)
    }
  }

  test("deleteFromIvfIndex: tombstones mask through appends; vacuum reclaims (C7h)") {
    val path = java.nio.file.Files.createTempDirectory("ivf_del").toString
    val half = df.filter($"vec_id" < 50)
    Ann.buildIvfIndex(half, "vec_id", "embedding", 32, path, numCells = 4)
    val probes = df.filter($"vec_id" < 2)
    def top5Ids() = Ann.ivfTopKIndexed(path, probes, "vec_id", "embedding", 32, 5)
      .select("vec_id").as[Long].collect().toSet
    val doomed = top5Ids().filter(_ >= 2L).take(3).toSeq.sorted
    val vacuumedNow = Ann.deleteFromIvfIndex(path, doomed.toDF("vec_id"), "vec_id")
    assert(!vacuumedNow, "3/50 must stay below the default compact threshold")
    assert(top5Ids().intersect(doomed.toSet).isEmpty, "tombstones must mask")
    // the erase survives later ingest — including a RE-APPEND of a
    // doomed id (masked until vacuum, the documented by-id semantics)
    Ann.appendToIvfIndex(path, df.filter($"vec_id" >= 50)
      .unionAll(half.filter($"vec_id" === doomed.head)),
      "vec_id", "embedding", 32)
    assert(top5Ids().intersect(doomed.toSet).isEmpty, "masking survives appends")
    val answered = top5Ids()
    // physical vacuum: answers identical, sidecar gone, bytes gone
    val cellsRewritten = Ann.vacuumIvfIndex(spark, path, "vec_id")
    assert(cellsRewritten >= 1)
    assert(top5Ids() == answered, "vacuum must not change one answer")
    assert(!new java.io.File(s"$path/_graft_tombstones").exists())
    val remaining = spark.read.parquet(path).select("vec_id").as[Long].collect()
    // the re-appended doomed.head copy was written AFTER the tombstone
    // but vacuum scrubs every physical row with a doomed id
    assert(remaining.toSet.intersect(doomed.toSet).isEmpty,
      "vacuum must physically remove every tombstoned row")
    // a vacuumed (tombstone-free) index accepts the id fresh again
    Ann.appendToIvfIndex(path, half.filter($"vec_id" === doomed.head),
      "vec_id", "embedding", 32)
    assert(spark.read.parquet(path).filter($"vec_id" === doomed.head).count() == 1L)
  }

  test("eraseKeys + deleteFromIvfIndex: an erased subject is unretrievable by search (A30/C7h)") {
    import graft.sinks.Snapshot
    val root = s"${Scratch.root(spark)}/ann_erase_${System.nanoTime()}"
    val emb = df
    Snapshot.publish(spark, root, Map("embeddings" -> emb))
    val idxPath = s"$root/ivf_index"
    Ann.buildIvfIndex(emb, "vec_id", "embedding", 32, idxPath, numCells = 4)
    val probes = emb.filter($"vec_id" < 2)
    val subject = Ann.ivfTopKIndexed(idxPath, probes, "vec_id", "embedding", 32, 5)
      .select("vec_id").as[Long].collect().filter(_ >= 2L).head
    val keys = Seq(subject).toDF("vec_id")
    // the A30 erase scrubs the governed table; the index delete is the
    // companion step that makes the subject unretrievable by SEARCH
    Snapshot.eraseKeys(spark, root, "embeddings", "vec_id", keys)
    Ann.deleteFromIvfIndex(idxPath, keys, "vec_id")
    assert(Snapshot.read(spark, root, "embeddings")
      .filter($"vec_id" === subject).count() == 0L)
    assert(!Ann.ivfTopKIndexed(idxPath, probes, "vec_id", "embedding", 32, 5)
      .select("vec_id").as[Long].collect().contains(subject))
  }

  test("recoverIvfIndex: interrupted-vacuum residue restores; reads refuse residue (r19)") {
    val path = java.nio.file.Files.createTempDirectory("ivf_rec").toString
    Ann.buildIvfIndex(df, "vec_id", "embedding", 32, path, numCells = 4)
    val probes = df.filter($"vec_id" < 2)
    def top5Ids() = Ann.ivfTopKIndexed(path, probes, "vec_id", "embedding", 32, 5)
      .select("vec_id").as[Long].collect().toSet
    val doomed = top5Ids().filter(_ >= 2L).take(2).toSeq.sorted
    Ann.deleteFromIvfIndex(path, doomed.toDF("vec_id"), "vec_id")
    val masked = top5Ids()
    val cell = spark.read.parquet(path).filter($"vec_id" === doomed.head)
      .select("cell").head().getInt(0)
    // crash state 1: cell moved aside, scrubbed tmp never landed (the
    // rename(cell -> bak) .. rename(tmp -> cell) window's FIRST half).
    // Reads must refuse (a missing cell is silent wrongness), and
    // recovery must UNDO — the sidecar still masks, so the unscrubbed
    // bak serves correct answers.
    assert(new java.io.File(s"$path/cell=$cell")
      .renameTo(new java.io.File(s"$path/.vacuum_bak_$cell")))
    intercept[IllegalArgumentException] { top5Ids() }
    assert(Ann.recoverIvfIndex(spark, path) == 1)
    assert(top5Ids() == masked, "undo-restore must serve identical answers")
    // crash state 2: mid-swap with the scrubbed tmp complete — recovery
    // must FINISH the swap (tmp wins: it is the scrubbed cell).
    assert(new java.io.File(s"$path/cell=$cell")
      .renameTo(new java.io.File(s"$path/.vacuum_bak_$cell")))
    spark.read.parquet(s"$path/.vacuum_bak_$cell")
      .join(broadcast(doomed.toDF("vec_id")), Seq("vec_id"), "left_anti")
      .write.parquet(s"$path/.vacuum_tmp_$cell")
    assert(Ann.recoverIvfIndex(spark, path) == 1)
    assert(top5Ids() == masked, "finish-swap restore must serve identical answers")
    // a rerun vacuum now completes instead of making the loss permanent
    Ann.vacuumIvfIndex(spark, path, "vec_id"): Unit
    assert(top5Ids() == masked)
    assert(!new java.io.File(s"$path/_graft_tombstones").exists())
    assert(spark.read.parquet(path).select("vec_id").as[Long].collect()
      .toSet.intersect(doomed.toSet).isEmpty)
  }
}
