package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/**
 * Bloom-filter runtime pruning for joins — the scan-side row
 * elimination that makes selective fact⋈dim joins viable at 100 TB.
 *
 * The problem shape: a semi/inner join where the dim side keeps only a
 * small fraction of fact keys still SHUFFLES (or at least scans and
 * feeds the join with) every fact row; the non-matching rows are
 * discarded only at the join operator. A Bloom filter built over the
 * dim keys (a few MB regardless of fact size) travels to the fact scan
 * as a plan literal and drops non-matching rows AT THE SCAN, before
 * any shuffle or join buffer sees them. False positives pass the bloom
 * and are eliminated by the exact join that follows, so results are
 * exactly the plain join's — the bloom only changes WHERE rows die.
 *
 * This is the manual, composable form of Catalyst's own
 * InjectRuntimeFilter rewrite (which only fires under narrow
 * selectivity/cost heuristics); building on the same
 * BloomFilterAggregate / BloomFilterMightContain expressions keeps the
 * probe codegen'd inside the scan's WholeStageCodegen span.
 */
object BloomJoin {

  /** Serialized Bloom filter over xxhash64(keyCol) of `dim`. The
   * aggregate is map-side partial (each partition builds a local
   * sketch; merge ORs the bit arrays), so building costs one scan of
   * the dim side and moves only numBits/8 bytes per partition.
   * An EMPTY dim yields a real all-zero filter (might_contain answers
   * false for every key) — BloomFilterAggregate itself evaluates to
   * NULL over zero rows, a silent landmine for callers. */
  def buildFilter(dim: DataFrame, keyCol: String,
      expectedItems: Long = 1000000L, numBits: Long = 8L * 1024 * 1024): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(numBits), 0, 0).toAggregateExpression()
    val row = dim.select(ColumnBridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems, numBits).writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a [[buildFilter]] sketch. The
   * filter bytes embed in the plan as a literal — the same way a
   * broadcast scalar subquery would arrive — so every task probes a
   * local copy; nothing shuffles. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(new BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Exact left-semi join with the fact side bloom-pruned at the scan.
   * Output is row-identical to `fact.join(dim, ..., "left_semi")`;
   * the bloom stage exists so that at scale the shuffle (or broadcast
   * probe) only ever sees the ~matching slice of the fact table. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bf = buildFilter(dim, dimKey, expectedItems, numBits)
    val pruned = fact.filter(mightContain(bf, col(factKey)))
    val keys = dim.select(col(dimKey)).distinct()
    // dataframe-qualified refs: unqualified col(factKey) === col(dimKey)
    // is ambiguous whenever both sides name the key identically
    pruned.join(keys, pruned(factKey) === keys(dimKey), "left_semi")
  }
}
