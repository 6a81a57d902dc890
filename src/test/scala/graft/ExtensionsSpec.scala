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

  test("round-3 additions are callable from SQL") {
    val r = spark.sql(
      """SELECT
         word_ngrams('a b c', 2) AS grams,
         sort_struct_array(array(named_struct('k', 2L), named_struct('k', 1L))) AS sorted,
         simhash_text('spark scans parquet') AS sht,
         size(winnow('the quick brown fox jumps over the lazy dog')) AS nw,
         lang_id('the cat is in the house and it is ready for this') AS lang
       """).head()
    val chunks = spark.sql("SELECT word_chunks('a b c d e', 2) AS c").head()
    assert(chunks.getSeq[String](0) == Seq("a b", "c d", "e"))
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)) == Seq(1L, 2L))
    assert(r.getLong(2) != 0L)
    assert(r.getInt(3) > 0)
    assert(r.getString(4) == "en")
  }

  test("round-8 additions are callable from SQL") {
    val r = spark.sql(
      """SELECT
         hash_containment(word_shingle_hashes('a b c d e'),
                          word_shingle_hashes('a b c d e f g h i j')) AS c_sub,
         hash_containment(word_shingle_hashes('a b c d e f g h i j'),
                          word_shingle_hashes('a b c d e')) AS c_super,
         word_chunks_strided('a b c d e f g', 4, 2) AS chunks
       """).head()
    assert(r.getDouble(0) == 1.0, "prefix's shingles are fully contained")
    assert(r.getDouble(1) < 1.0, "the superset is NOT contained in the subset")
    assert(r.getSeq[String](2) == Seq("a b c d", "c d e f", "e f g", "g"))
  }

  test("round-13 additions are callable from SQL") {
    val r = spark.sql(
      """SELECT
         normalize_text('Café  du   Monde', 'NFKC', true, true, true) AS norm,
         normalize_text('abc') AS noop,
         search_sorted(25L, array(10L, 20L, 30L)) AS band,
         search_sorted(5L, array(10L, 20L, 30L)) AS below,
         search_sorted(30L, array(10L, 20L, 30L)) AS on_break
       """).head()
    assert(r.getString(0) == "cafe du monde")
    assert(r.getString(1) == "abc")
    assert(r.getInt(2) == 2 && r.getInt(3) == 0 && r.getInt(4) == 3)
    val bad = intercept[Exception](
      spark.sql("SELECT search_sorted(1L, array(3L, 1L))").head())
    assert(bad.getMessage.contains("ascending"), s"unexpected: ${bad.getMessage}")
    // a double array must be rejected, not silently truncated to ints
    val dbl = intercept[Exception](
      spark.sql("SELECT search_sorted(1L, array(1.5D, 2.5D))").head())
    assert(dbl.getMessage.contains("integral array"), s"unexpected: ${dbl.getMessage}")
    val nul = intercept[Exception](
      spark.sql("SELECT search_sorted(1L, array(1L, NULL))").head())
    assert(nul.getMessage.contains("NULL elements"), s"unexpected: ${nul.getMessage}")
  }

  test("round-16 additions are callable from SQL") {
    val r = spark.sql(
      "SELECT gopher_top_ppm('a b a b a b') AS g," +
        " gopher_top_ppm('a b a b a b', 2, 2) AS g2," +
        " hashed_linear_score('alpha beta alpha') AS s," +
        " hashed_linear_score('alpha beta alpha', 65536, 7) AS s7").head()
    assert(r.getSeq[Long](0) == Seq(818181L, 909090L, 1272727L))
    assert(r.getSeq[Long](1) == Seq(818181L))
    // SQL defaults (buckets=65536, seed=1) match the kernel directly
    import org.apache.spark.unsafe.types.UTF8String
    assert(r.getLong(2) == graft.functions.HashOps.hashedLinearScore(
      UTF8String.fromString("alpha beta alpha"), 65536L, 1L))
    assert(r.getLong(3) == graft.functions.HashOps.hashedLinearScore(
      UTF8String.fromString("alpha beta alpha"), 65536L, 7L))
    // non-literal knobs are refused loudly
    val e = intercept[Exception](
      spark.sql("SELECT hashed_linear_score('x', id, 1) FROM range(1)").head())
    assert(e.getMessage.contains("literal integer"), e.getMessage)
  }

  test("bitmap_distinct: exact vs COUNT(DISTINCT), null-safe, loud out-of-domain") {
    import spark.implicits._
    // duplicates across partitions force partial-state merges
    val df = ((1 to 500).map(i => i.toLong % 37) ++ Seq.fill(10)(5L))
      .toDF("k").repartition(7)
    df.createOrReplaceTempView("bm_in")
    val r = spark.sql(
      "SELECT bitmap_distinct(k, 64) AS b, COUNT(DISTINCT k) AS cd FROM bm_in").head()
    assert(r.getLong(0) == r.getLong(1))
    // nulls are ignored, like every SQL aggregate
    val n = spark.sql(
      "SELECT bitmap_distinct(x, 8) FROM VALUES (0L), (NULL), (3L), (3L) AS t(x)").head()
    assert(n.getLong(0) == 2L)
    val e = intercept[Exception](
      spark.sql("SELECT bitmap_distinct(x, 4) FROM VALUES (9L) AS t(x)").head())
    assert(e.getMessage.contains("outside declared domain") ||
      Option(e.getCause).exists(_.getMessage.contains("outside declared domain")),
      s"unexpected: ${e.getMessage}")
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
    // array() is ArrayType(NullType) with no elements — evaluates fine;
    // empty∪empty jaccard is 0.0 (degenerate-doc contract, round 13:
    // shingle-less inputs are in no dup relation)
    assert(spark.sql("SELECT minhash_sig(array())").head().getSeq[Long](0).nonEmpty)
    assert(spark.sql("SELECT hash_jaccard(array(), array())").head().getDouble(0) == 0.0)
    // non-empty null-element arrays: nulls are ignored, no NPE
    assert(spark.sql("SELECT hash_jaccard(array(NULL), array(NULL))").head().getDouble(0) == 0.0)
    assert(spark.sql("SELECT simhash64(array(NULL))").head().getLong(0) == 0L,
      "no tokens → no votes → zero signature")
  }

  test("array_field_sum sums one struct field, skipping nulls") {
    val r = spark.sql(
      """SELECT
         array_field_sum(array(named_struct('a', 1L, 'b', 'x'),
                               named_struct('a', 2L, 'b', 'y')), 'a') AS s,
         array_field_sum(array(named_struct('a', 1L), NULL,
                               named_struct('a', CAST(NULL AS BIGINT))), 'a') AS s_nulls,
         array_field_sum(CAST(array() AS ARRAY<STRUCT<a: BIGINT>>), 'a') AS s_empty,
         array_field_sum(NULL, 'a') AS s_null
       """).head()
    assert(r.getLong(0) == 3L)
    assert(r.getLong(1) == 1L, "null element and null field contribute 0")
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3))
  }

  test("array_field_sum rejects wrong field types and missing fields at analysis") {
    def fails(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql).head())
      assert(e.getMessage.contains(frag) || e.getMessage.contains("DATATYPE_MISMATCH"),
        s"unexpected error: ${e.getMessage}")
    }
    fails("SELECT array_field_sum(array(named_struct('a', 1)), 'a')", "must be BIGINT")
    fails("SELECT array_field_sum(array(named_struct('a', 1L)), 'z')", "no field 'z'")
    fails("SELECT array_field_sum(array(1L), 'a')", "requires array<struct>")
    fails("SELECT array_field_sum(array(named_struct('a', 1L)), CAST(NULL AS STRING))",
      "non-null literal string")
    // default session is case-insensitive, like built-in struct access
    assert(spark.sql("SELECT array_field_sum(array(named_struct('a', 1L)), 'A')")
      .head().getLong(0) == 1L)
    // matches an equivalent explode + SUM
    val df = spark.range(100).selectExpr(
      "id % 7 AS k", "named_struct('v', id) AS s")
      .groupBy("k").agg(org.apache.spark.sql.functions.collect_list("s").as("arr"))
    val viaExpr = df.selectExpr("k", "array_field_sum(arr, 'v') AS s")
    val viaExplode = spark.range(100).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").agg(org.apache.spark.sql.functions.sum("v").as("s"))
    assert(viaExpr.except(viaExplode).isEmpty && viaExplode.except(viaExpr).isEmpty)
  }
}
