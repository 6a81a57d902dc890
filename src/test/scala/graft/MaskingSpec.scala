package graft

import graft.operators.Masking
import org.scalatest.funsuite.AnyFunSuite

/** A28: the mask-action matrix, default-deny column dropping, and
  * the fail-loud paths (absent column, unknown action, bucket on a
  * non-integral column). */
class MaskingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, "alice", "BUILDING", 12345L, 99L),
    (2L, "bob", "AUTO", -2500L, 98L)
  ).toDF("id", "name", "seg", "cents", "secret")

  private def policy(rows: (String, String, Long)*) =
    rows.toDF("column", "action", "param")

  test("action matrix: keep, sha256, prefix, bucket, null; default-deny drop") {
    val out = Masking.applyPolicy(df, policy(
      ("id", "keep", 0L), ("name", "sha256", 0L), ("seg", "prefix", 2L),
      ("cents", "bucket", 1000L)))
    assert(out.columns.toList == List("id", "name", "seg", "cents"),
      "unlisted 'secret' must be dropped")
    val rows = out.as[(Long, String, String, Long)]
      .collect().sortBy(_._1).toList
    val sha = java.security.MessageDigest.getInstance("SHA-256")
    def hex(s: String) =
      sha.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rows == List(
      (1L, hex("alice"), "BU***", 12000L),
      // negative bucket truncates toward zero, like Spark div / DuckDB //
      (2L, hex("bob"), "AU***", -2000L)))
  }

  test("typed null keeps the column present without values") {
    val out = Masking.applyPolicy(df, policy(
      ("id", "keep", 0L), ("cents", "null", 0L)))
    assert(out.schema("cents").dataType.typeName == "long")
    assert(out.select("cents").collect().forall(_.isNullAt(0)))
  }

  test("CLI mask verb core: policy string parse, apply, write, read-back") {
    val base = java.nio.file.Files.createTempDirectory("mask_cli").toString
    df.write.parquet(s"$base/t.parquet")
    val out = s"$base/out"
    val n = graft.pipelines.Run.maskTable(spark, base, "t",
      "id:keep,name:sha256,seg:prefix:2,cents:bucket:1000", out)
    assert(n == 2L)
    val back = spark.read.parquet(out)
    assert(back.columns.toList == List("id", "name", "seg", "cents"))
    assert(back.select("seg").as[String].collect().toSet == Set("BU***", "AU***"))
    intercept[IllegalArgumentException] {
      graft.pipelines.Run.maskTable(spark, base, "t", "id:keep,oops", out)
    }
  }

  test("fail-loud: absent column, unknown action, bucket on non-integral") {
    intercept[IllegalArgumentException] {
      Masking.applyPolicy(df, policy(("nope", "keep", 0L)))
    }
    intercept[IllegalArgumentException] {
      Masking.applyPolicy(df, policy(("id", "rot13", 0L)))
    }
    intercept[IllegalArgumentException] {
      Masking.applyPolicy(df, policy(("name", "bucket", 10L)))
    }
    intercept[IllegalArgumentException] {
      Masking.applyPolicy(df, policy(("seg", "prefix", 0L)))
    }
  }
}
