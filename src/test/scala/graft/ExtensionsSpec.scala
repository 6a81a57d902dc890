package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate reuses any live session and ignores builder-time
  // extensions, so register on the shared session instead — this is
  // also the path a user with an existing session takes.
  private lazy val spark: SparkSession = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  test("graft expressions are callable from SQL") {
    val r = spark.sql(
      """SELECT
         simhash64(array('spark', 'scans', 'parquet')) AS sh,
         fingerprint64('hello world') AS fp,
         hash_jaccard(word_shingle_hashes('a b c d e'), word_shingle_hashes('a b c d e')) AS j_same,
         hash_jaccard(word_shingle_hashes('a b c d e'), word_shingle_hashes('x y z w v')) AS j_diff,
         size(minhash_sig(word_shingle_hashes('a b c d e'))) AS n_perm,
         cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos_same
       """).head()
    assert(r.getLong(0) != 0L && r.getLong(1) != 0L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0)
    assert(r.getInt(4) == 64)
    assert(r.getDouble(5) == 1.0)
  }

  test("mistyped array inputs are rejected at analysis, not silently misread") {
    // ArrayData reads at fixed byte widths: array<int> into getLong
    // would yield garbage hashes — must fail analysis instead
    def fails(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).head())
      assert(e.getMessage.toLowerCase.contains("requires array") ||
        e.getMessage.contains("DATATYPE_MISMATCH"), s"unexpected error: ${e.getMessage}")
    }
    fails("SELECT hash_jaccard(array(1, 2, 3), array(1, 2, 3))")
    fails("SELECT minhash_sig(array(1, 2, 3))")
    fails("SELECT simhash64(array(1L, 2L))")
    fails("SELECT cosine_sim(array('a'), array('b'))")
    // correctly typed still passes
    assert(spark.sql("SELECT hash_jaccard(array(1L, 2L), array(1L, 2L))").head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT simhash64(array('a', 'b'))").head().getLong(0) != 0L)
  }

  test("untyped NULL and empty-array literals are accepted, like builtins") {
    // NULL input → NULL result (nullSafeEval skipped)
    assert(spark.sql("SELECT simhash64(NULL)").head().isNullAt(0))
    assert(spark.sql("SELECT minhash_sig(NULL)").head().isNullAt(0))
    // array() is ArrayType(NullType) with no elements — evaluates fine
    assert(spark.sql("SELECT minhash_sig(array())").head().getSeq[Long](0).nonEmpty)
    assert(spark.sql("SELECT hash_jaccard(array(), array())").head().getDouble(0) == 1.0)
    // non-empty null-element arrays: nulls are ignored, no NPE
    assert(spark.sql("SELECT hash_jaccard(array(NULL), array(NULL))").head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT simhash64(array(NULL))").head().getLong(0) == 0L,
      "no tokens → no votes → zero signature")
  }
}
