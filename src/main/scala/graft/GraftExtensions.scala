package graft

import graft.functions._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/**
 * Session extensions registering graft's native expressions as SQL
 * functions, so `spark.sql("SELECT simhash64(split(text, ' ')) ...")`
 * works anywhere the library is on the classpath:
 *
 *   SparkSession.builder()
 *     .config("spark.sql.extensions", "graft.GraftExtensions")
 *     ...
 *
 * (or `.withExtensions(new GraftExtensions)`). For a session that
 * already exists (builder extensions only apply at build time), use
 * `GraftExtensions.register(spark)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}

object GraftExtensions {

  private def intArg(args: Seq[Expression], i: Int, default: Int): Int =
    if (args.length > i) args(i).eval().asInstanceOf[Number].intValue() else default

  private def arity(name: String, n: Int)(b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length != n)
        throw new IllegalArgumentException(s"$name requires exactly $n argument(s), got ${args.length}")
      b(args)
    }

  /** (name, usage, expression builder) for every graft SQL function. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array",
      arity("simhash64", 1)(args => SimHash64(args.head))),
    ("fingerprint64", "fingerprint64(text) - FNV-1a 64-bit document fingerprint",
      arity("fingerprint64", 1)(args => Fingerprint64(args.head))),
    ("word_shingle_hashes", "word_shingle_hashes(text[, n]) - sorted distinct word n-gram hashes",
      (args: Seq[Expression]) => WordShingleHashes(args.head, intArg(args, 1, 3))),
    ("minhash_sig", "minhash_sig(hashes[, numPerm]) - MinHash signature of a hash set",
      (args: Seq[Expression]) => MinHashSig(args.head, intArg(args, 1, 64))),
    ("hash_jaccard", "hash_jaccard(a, b) - Jaccard similarity of sorted distinct hash arrays",
      arity("hash_jaccard", 2)(args => HashJaccard(args.head, args(1)))),
    ("cosine_sim", "cosine_sim(a, b) - cosine similarity of numeric vectors",
      arity("cosine_sim", 2)(args => CosineSim(args.head, args(1)))),
  )

  /** Register all graft functions on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftglue.ColumnBridge.registerFunction(spark, name, builder)
    }
}
