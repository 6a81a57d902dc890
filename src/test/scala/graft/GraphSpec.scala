package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank one iteration matches the hand-computed ppm recurrence") {
    // 1→2, 2→3, 3→1, 1→4: node 1 splits its mass, 4 is dangling
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // contribs: 1→{2,4}: 500000 each; 2→3: 1000000; 3→1: 1000000
    // rank1 = 150000 + 85·insum div 100
    assert(got == Seq(
      (1L, 1000000L),
      (2L, 575000L),
      (3L, 1000000L),
      (4L, 575000L)))
  }

  test("pageRank round snapshots honor the spark.graft.scratchDir knob") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scratch_test").toString
    spark.conf.set("spark.graft.scratchDir", tmp)
    try {
      val edges = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
      val got = Graph.pageRank(edges, "s", "d", iters = 1)
        .orderBy("node").as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 1000000L), (2L, 1000000L)))
      val sub = Option(new java.io.File(tmp).listFiles()).getOrElse(Array.empty)
      assert(sub.exists(_.getName.startsWith("pagerank_")),
        s"configured scratch dir unused: ${sub.map(_.getName).toSeq}")
      // configured (durable) scratch is NEVER auto-deleted by graft —
      // the round snapshots must still be on disk after the query
      assert(new java.io.File(tmp).exists())
    } finally spark.conf.unset("spark.graft.scratchDir")
  }

  test("pageRank sinks keep the base rank; repeated edges collapse") {
    // duplicate edge 1→2 must count once; node 3 has no in-links
    val edges = Seq((1L, 2L), (1L, 2L), (3L, 2L)).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // 1 and 3 each send 1000000 to 2: insum = 2000000 → 1850000
    assert(got == Seq(
      (1L, 150000L),
      (2L, 1850000L),
      (3L, 150000L)))
  }

  test("pageRank converges toward the cycle's stationary shape") {
    // pure 3-cycle: every node keeps rank 1000000 at every iteration
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Graph.pageRank(edges, "s", "d", iters = 5)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1000000L), (2L, 1000000L), (3L, 1000000L)))
  }

  test("triangleCount: K4 has 4 triangles, a path has none") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("s", "d")
    assert(Graph.triangleCount(k4, "s", "d").as[Long].head() == 4L)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    assert(Graph.triangleCount(path, "s", "d").as[Long].head() == 0L)
  }

  test("triangleCount canonicalizes input: duplicates, reversals, self-loops") {
    // one triangle fed as a mess of both directions, repeats, and loops
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 3L), (1L, 1L)).toDF("s", "d")
    assert(Graph.triangleCount(messy, "s", "d").as[Long].head() == 1L)
  }

  test("triangleCount is exact at node ids >= 1e7 (packed-key collision graph)") {
    // Crafted so the FORMER packed order key d*1e7 + n collides:
    // node 5 (degree 3) and node 10_000_005 (degree 2) both packed to
    // 30_000_005, which dropped the wedge at node 1 and returned 0.
    // Genuine (degree, id) ordering must count the one triangle.
    val edges = Seq(
      (5L, 10000005L), (5L, 1L), (10000005L, 1L), // triangle {1, 5, 1e7+5}
      (5L, 99L)                                   // pendant makes deg(5)=3
    ).toDF("s", "d")
    assert(Graph.triangleCount(edges, "s", "d").as[Long].head() == 1L)
    // and a whole K4 shifted far past the old 1e7 domain bound
    val off = 100000000L
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b }
      yield (a + off, b + off)).toDF("s", "d")
    assert(Graph.triangleCount(k4, "s", "d").as[Long].head() == 4L)
  }

  test("triangleCount matches brute force on random graphs at random huge id offsets") {
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 4) {
      val n = 10
      val off = math.abs(rnd.nextLong()) % (1L << 40)
      val base = (for {
        a <- 0 until n; b <- 0 until n
        if a < b && rnd.nextInt(3) == 0
      } yield (a.toLong, b.toLong)).toVector
      val brute = (for {
        x <- 0 until n; y <- x + 1 until n; z <- y + 1 until n
        if base.contains((x.toLong, y.toLong)) &&
          base.contains((y.toLong, z.toLong)) &&
          base.contains((x.toLong, z.toLong))
      } yield 1).size.toLong
      val edges = base.map { case (a, b) => (a + off, b + off) }.toDF("s", "d")
      val got = Graph.triangleCount(edges, "s", "d").as[Long].head()
      assert(got == brute, s"offset $off: got $got want $brute (edges $base)")
    }
  }

  test("triangleCount on a hub graph counts each triangle exactly once") {
    // hub 0 connected to 1..6; ring among leaves 1-2,3-4,5-6 → 3 triangles
    val edges = ((1L to 6L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L), (5L, 6L)))
      .toDF("s", "d")
    assert(Graph.triangleCount(edges, "s", "d").as[Long].head() == 3L)
  }

  test("triangleCount spill-safe fallback conf yields identical counts (ADVICE r19)") {
    // spark.graft.triangles.shuffleHash=false drops the shuffle_hash
    // hint (planner falls back to its spill-safe choice); the count is
    // strategy-independent.
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("s", "d")
    val hub = ((1L to 6L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L), (5L, 6L)))
      .toDF("s", "d")
    spark.conf.set("spark.graft.triangles.shuffleHash", "false")
    try {
      assert(Graph.triangleCount(k4, "s", "d").as[Long].head() == 4L)
      assert(Graph.triangleCount(hub, "s", "d").as[Long].head() == 3L)
    } finally spark.conf.unset("spark.graft.triangles.shuffleHash")
  }

  private def bfs(
      edges: Seq[(Long, Long)], sources: Seq[Long], maxHops: Int): Map[Long, Long] = {
    // undirected: pass both orientations, as the operator contract asks
    val e = (edges ++ edges.map(_.swap)).toDF("a", "b")
    Graph.shortestPaths(e, "a", "b", sources.toDF("s"), "s", maxHops)
      .as[(Long, Long)].collect().toMap
  }

  test("shortestPaths: hop distances on a path graph, bounded by maxHops") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(path, Seq(1L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    assert(bfs(path, Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L),
      "nodes beyond maxHops must be absent, not infinite")
  }

  test("shortestPaths: cycles terminate; shorter of two routes wins") {
    // 1-2-3-4-1 square plus chord 1-3: node 3 is 1 hop via the chord
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    assert(bfs(sq, Seq(1L), 10) == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("shortestPaths: multi-source settles at the nearest source") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(bfs(path, Seq(1L, 5L), 10) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("shortestPaths: isolated source settles at 0; disconnected node absent") {
    val comp = Seq((1L, 2L))
    assert(bfs(comp, Seq(9L), 5) == Map(9L -> 0L))
    assert(bfs(comp, Seq(1L), 5) == Map(1L -> 0L, 2L -> 1L))
  }

  test("subtreeRollup sums whole subtrees, forest roots independent") {
    import spark.implicits._
    //      1(10)           6(1)
    //     /    \
    //   2(20)  3(30)
    //   /
    // 4(40)
    val nodes = Seq(
      (1L, None: Option[Long], 10L), (2L, Some(1L), 20L), (3L, Some(1L), 30L),
      (4L, Some(2L), 40L), (6L, None: Option[Long], 1L)
    ).toDF("id", "parent", "v")
    val out = graft.operators.Graph.subtreeRollup(nodes, "id", "parent", "v", 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      1L -> ((4L, 100L)), 2L -> ((2L, 60L)), 3L -> ((1L, 30L)),
      4L -> ((1L, 40L)), 6L -> ((1L, 1L))))
  }

  test("subtreeRollup refuses chains deeper than maxDepth instead of undercounting") {
    import spark.implicits._
    val chain = Seq((1L, None: Option[Long], 1L), (2L, Some(1L), 1L),
      (3L, Some(2L), 1L), (4L, Some(3L), 1L)).toDF("id", "parent", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graph.subtreeRollup(chain, "id", "parent", "v", maxDepth = 2)
    }
    assert(e.getMessage.contains("longer than maxDepth"))
    // deep enough succeeds and the root sees the whole chain
    val ok = graft.operators.Graph.subtreeRollup(chain, "id", "parent", "v", 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(ok(1L) == 4L)
  }

  test("bomExplode multiplies quantities along paths; hand-checked assembly") {
    import spark.implicits._
    // 1 (root assembly): contains 2 x sub-assembly(2), 5 x part(4);
    // sub-assembly 2 contains 3 x part(3). Per unit of 1:
    // 2 -> 2 units, 3 -> 2*3 = 6, 4 -> 5 -> total 13 units, 3 parts.
    val bom = Seq(
      (1L, None: Option[Long], 1L),
      (2L, Some(1L), 2L),
      (3L, Some(2L), 3L),
      (4L, Some(1L), 5L)).toDF("id", "parent", "q")
    val got = graft.operators.Graph.bomExplode(bom, "id", "parent", "q", 4)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((3L, 13L)), 2L -> ((1L, 3L))))
  }

  test("bomExplode refuses chains deeper than maxDepth; forests stay independent") {
    import spark.implicits._
    val two = Seq(
      (1L, None: Option[Long], 1L), (2L, Some(1L), 4L),
      (7L, None: Option[Long], 1L), (8L, Some(7L), 9L), (9L, Some(8L), 2L)
    ).toDF("id", "parent", "q")
    val got = graft.operators.Graph.bomExplode(two, "id", "parent", "q", 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // tree A: 1 <- 2(4). tree B: 7 <- 8(9) <- 9(2): 7 sees 8 (9 units)
    // and 9 (9*2 = 18 units)
    assert(got == Map(
      1L -> ((1L, 4L)), 7L -> ((2L, 27L)), 8L -> ((1L, 2L))))
    val e = intercept[IllegalArgumentException] {
      graft.operators.Graph.bomExplode(two, "id", "parent", "q", 1)
    }
    assert(e.getMessage.contains("longer than maxDepth"))
  }

  test("criticalPath takes the longest route through a diamond") {
    // 1→2 (3), 1→3 (2), 2→4 (4), 3→4 (10): best into 4 is 2+10=12
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 2L), (2L, 4L, 4L), (3L, 4L, 10L))
      .toDF("u", "v", "w")
    val got = Graph.criticalPath(edges, "u", "v", "w")
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 3L), (3L, 2L), (4L, 12L)))
  }

  test("criticalPath fails loudly on a reachable cycle instead of undercounting") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L)).toDF("u", "v", "w")
    val e = intercept[IllegalArgumentException] {
      Graph.criticalPath(edges, "u", "v", "w", maxRounds = 8)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("pathCounts: diamond has two routes into the sink; cycles refuse") {
    // 1→2, 1→3, 2→4, 3→4 plus 4→5: paths into 4 = {1-2-4, 1-3-4, 2-4,
    // 3-4} = 4; into 5 = those ×→5 plus 4-5 = 5; into 2/3 = 1 each
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Graph.pathCounts(edges, "u", "v")
      .selectExpr("id", "cast(n_paths as long)")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
    val e = intercept[IllegalArgumentException] {
      Graph.pathCounts(Seq((1L, 2L), (2L, 1L)).toDF("u", "v"), "u", "v",
        maxRounds = 8)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("cycleStats finds each terminal cycle with its min label and size") {
    // 5→4→3, cycle 3→1→2→3, self-loop 6→6
    val nxt = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 3L), (5L, 4L), (6L, 6L))
      .toDF("id", "n")
    val got = Graph.cycleStats(nxt, "id", "n")
      .orderBy("cycle_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (6L, 1L)))
  }

  test("cycleStats on a pure permutation reports every node on a cycle") {
    // two disjoint cycles: (10 20 30) and (40 50)
    val nxt = Seq((10L, 20L), (20L, 30L), (30L, 10L), (40L, 50L), (50L, 40L))
      .toDF("id", "n")
    val got = Graph.cycleStats(nxt, "id", "n")
      .orderBy("cycle_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((10L, 3L), (40L, 2L)))
  }
}
