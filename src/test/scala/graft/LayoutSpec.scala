package graft

import java.nio.file.Files

import graft.operators.{BloomJoin, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- ZOrder -------------------------------------------------------------

  /** Reference bit-interleave: z bit 2i = x bit i, z bit 2i+1 = y bit i. */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zvalue matches the bit-by-bit Morton reference") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (40000L, 1L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zvalue($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == mortonRef(x, y), s"zvalue($x, $y) = $z != ${mortonRef(x, y)}")
    }
  }

  test("zvalue masks inputs above 16 bits instead of corrupting neighbors") {
    val Seq(z1, z2) = Seq((65536L + 5L, 3L), (5L, 3L)).toDF("x", "y")
      .select(ZOrder.zvalue($"x", $"y")).as[Long].collect().toSeq
    assert(z1 == z2, "bit 16 of x must not leak into the z-value")
  }

  test("scaleTo16 survives a constant column (min == max) under ANSI mode") {
    val got = Seq(7L, 7L).toDF("v")
      .select(ZOrder.scaleTo16($"v", lit(7L), lit(7L)).as("s"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 0L), s"degenerate domain must scale to 0, got $got")
  }

  test("z-ordered files bound BOTH keys tightly; a linear sort bounds only its own") {
    // 64k points on a 256x256 grid, uniformly shuffled
    val n = 1 << 16
    val pts = spark.range(n)
      .select(pmod(xxhash64($"id"), lit(256L)).as("x"),
        pmod(xxhash64($"id" + 7919), lit(256L)).as("y"))
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val linDir = Files.createTempDirectory("graft_linear").toString
    ZOrder.writeZOrdered(pts.withColumn("x", $"x" * 256).withColumn("y", $"y" * 256),
      "x", "y", zDir, numFiles = 16)
    pts.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    // per-file bounding boxes via input_file_name (footer stats mirror these)
    def avgSide(dir: String, c: String, scale: Long): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))) / scale).as("span"))
        .select(avg($"span")).as[Double].head()
      spans
    }
    val zX = avgSide(zDir, "x", 256)  // undo the *256 scaling
    val zY = avgSide(zDir, "y", 256)
    val linX = avgSide(linDir, "x", 1)
    val linY = avgSide(linDir, "y", 1)
    // linear layout: its own key is tight, the other spans ~the full 0..255
    assert(linX < 32, s"linear sort should bound x tightly, avg span $linX")
    assert(linY > 200, s"linear sort leaves y unbounded per file, avg span $linY")
    // z-order: 16 files over a 2^32 curve → each file is a run of curve
    // cells whose box sides stay a fraction of the 256-wide domain
    assert(zX < 128 && zY < 128,
      s"z-order should bound both keys per file, got x=$zX y=$zY")
    assert(zX + zY < linX + linY,
      "z-order total bounding must beat single-key sort")
  }

  // --- BloomJoin ----------------------------------------------------------

  private lazy val fact = (1L to 10000L).map(i => (i, i % 97)).toDF("fk", "payload")
  private lazy val dim = (1L to 10000L by 100).map(i => (i, s"d$i")).toDF("dk", "label")

  test("bloomSemiJoin returns exactly the plain semi join's rows") {
    val plain = fact.join(dim, $"fk" === $"dk", "left_semi")
    val bloomed = BloomJoin.bloomSemiJoin(fact, dim, "fk", "dk")
    assert(bloomed.count() == plain.count())
    assert(bloomed.except(plain).isEmpty && plain.except(bloomed).isEmpty)
  }

  test("bloom prefilter drops most non-matching rows before the join") {
    val bf = BloomJoin.buildFilter(dim, "dk")
    val passed = fact.filter(BloomJoin.mightContain(bf, $"fk")).count()
    // 100 true matches of 10000; the 8M-bit filter keeps FPs near zero
    assert(passed >= 100 && passed < 300,
      s"bloom should pass ~100 of 10000 rows, passed $passed")
  }

  test("bloomSemiJoin resolves when fact and dim share the key column name") {
    val dimSame = dim.withColumnRenamed("dk", "fk")
    val got = BloomJoin.bloomSemiJoin(fact, dimSame, "fk", "fk")
    assert(got.count() == fact.join(dim, $"fk" === $"dk", "left_semi").count())
  }

  test("buildFilter over an empty dim yields a real filter that rejects everything") {
    val bf = BloomJoin.buildFilter(dim.filter($"dk" < 0), "dk")
    assert(bf != null, "empty dim must not produce a null filter")
    assert(fact.filter(BloomJoin.mightContain(bf, $"fk")).count() == 0)
  }

  test("bloom probe stays inside the scan's codegen span (no shuffle before filter)") {
    val bf = BloomJoin.buildFilter(dim, "dk")
    // a local Seq would be ConvertToLocalRelation-folded through the
    // filter at plan time — probe a physical scan instead
    val plan = spark.range(1, 10001).select($"id".as("fk"))
      .filter(BloomJoin.mightContain(bf, $"fk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"probe expression missing from plan:\n$plan")
    assert(!plan.contains("Exchange"), s"bloom prefilter must not shuffle:\n$plan")
  }

  // --- Partitioned layout + dynamic partition pruning ---------------------

  test("partitioned layout: dim join prunes fact partitions at runtime (DPP)") {
    val dir = Files.createTempDirectory("graft_dpp").toFile.getAbsolutePath
    // 20 partitions of 50 rows each
    val facts = spark.range(1000)
      .select(concat(lit("p"), $"id" % 20).as("pk"), $"id".as("v"))
    graft.sinks.TableSink.writeTruncate(facts, dir, partitionBy = Seq("pk"))
    val dim = spark.range(20)
      .select(concat(lit("p"), $"id").as("dk"), $"id".as("attr"))
      .filter($"attr" < 3) // selects 3 of 20 partitions — only at runtime
    val joined = spark.read.parquet(dir)
      .join(broadcast(dim), $"pk" === $"dk")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning partition filter on the fact scan:\n$plan")
    // pruning must lose no rows: 3 partitions x 50 rows — collect()
    // executes THIS queryExecution, so its scan metrics populate
    assert(joined.collect().length == 150)
    // and the executed scan reports only the pruned partition set
    // (recurse through the AQE wrappers to reach the physical scan)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numPartitions").value == 3,
      "fact scan should touch exactly the 3 dim-selected partitions")
  }
}
