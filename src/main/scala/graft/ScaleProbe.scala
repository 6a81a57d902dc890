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
    spark.stop()
  }
}
