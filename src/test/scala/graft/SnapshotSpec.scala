package graft

import graft.sinks.Snapshot
import org.scalatest.funsuite.AnyFunSuite

class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    s"${Scratch.root(spark)}/snapspec_${System.nanoTime()}"

  test("publish then read round-trips every table of the version") {
    val root = freshRoot()
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val b = Seq((10L, 100L)).toDF("id", "n")
    assert(Snapshot.publish(spark, root, Map("a" -> a, "b" -> b)) == 1L)
    assert(Snapshot.currentVersion(spark, root) == 1L)
    assert(Snapshot.read(spark, root, "a").as[(Long, String)].collect().toSet ==
      Set((1L, "x"), (2L, "y")))
    assert(Snapshot.read(spark, root, "b").as[(Long, Long)].collect().toList ==
      List((10L, 100L)))
  }

  test("a new publish flips atomically; the old version stays readable (time travel)") {
    val root = freshRoot()
    Snapshot.publish(spark, root, Map("t" -> Seq(1L).toDF("x")))
    Snapshot.publish(spark, root, Map("t" -> Seq(2L, 3L).toDF("x")))
    assert(Snapshot.currentVersion(spark, root) == 2L)
    assert(Snapshot.read(spark, root, "t").as[Long].collect().toSet == Set(2L, 3L))
    assert(Snapshot.read(spark, root, "t", Some(1L)).as[Long].collect().toList ==
      List(1L))
  }

  test("a crashed publish (version dir without a manifest flip) stays invisible") {
    val root = freshRoot()
    Snapshot.publish(spark, root, Map("t" -> Seq(7L).toDF("x")))
    // simulate a publisher that died after writing data, before the flip:
    // the v2 directory exists but the manifest still names v1
    Seq(99L).toDF("x").write.parquet(s"$root/v2/t")
    assert(Snapshot.currentVersion(spark, root) == 1L)
    assert(Snapshot.read(spark, root, "t").as[Long].collect().toList == List(7L))
  }

  test("reading an unpublished root or publishing unsafe names fails loudly") {
    val root = freshRoot()
    intercept[IllegalArgumentException](Snapshot.read(spark, root, "t"))
    intercept[IllegalArgumentException](
      Snapshot.publish(spark, root, Map("../evil" -> Seq(1L).toDF("x"))))
  }
}
