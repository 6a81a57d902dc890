package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality constraint audit — the dbt-tests / Deequ
 * capability a warehouse migration expects around every load the
 * reference performs blindly (BQETLSimple.java writes whatever the
 * transform produced; nothing ever checks a key stayed unique or a
 * foreign key still resolves). One call audits a table against a
 * constraint list and returns ONE ROW PER CONSTRAINT with violation
 * counts — audit, never abort: the caller decides whether a nonzero
 * count fails the pipeline, quarantines (A14's pattern), or just
 * alerts.
 *
 * Scale shape, by constraint class:
 *  - all ROW-LOCAL constraints (`NotNull`, `AcceptedValues`,
 *    `InRange`) compile into a SINGLE conditional-aggregate pass over
 *    the table — one scan, map-side combined, no shuffle beyond the
 *    1-row aggregate, however many such constraints are listed;
 *  - `Unique` is one hash aggregate on the key set (count minus
 *    distinct-count — the second-occurrence count, not a pair count,
 *    so a hot duplicate key costs its group size, never group²);
 *  - `RefIntegrity` is one anti-join count per FK against the
 *    DISTINCT dimension keys — broadcast when the dimension is small
 *    (the usual case), plain shuffle join otherwise; the fact side
 *    never collects.
 *
 * Everything is engine-replayable integer counting — the DuckDB
 * oracle recomputes every row (`q_constraint_audit`).
 */
object Constraints {

  /** One auditable constraint. `label` names the output row. */
  sealed trait Constraint { def label: String }

  /** `col` must be non-null. */
  final case class NotNull(col: String) extends Constraint {
    def label: String = s"not_null($col)"
  }

  /** `cols` must be row-unique. Violations = rows beyond the first
   * occurrence of each duplicated key (total − distinct). */
  final case class Unique(cols: Seq[String]) extends Constraint {
    require(cols.nonEmpty, "Unique needs at least one column")
    def label: String = s"unique(${cols.mkString(",")})"
  }

  /** Non-null values of `col` must be one of `values` (string space —
   * cast upstream for other types). NULL is NotNull's business, not
   * double-counted here. */
  final case class AcceptedValues(col: String, values: Seq[String])
      extends Constraint {
    require(values.nonEmpty, "AcceptedValues needs a non-empty domain")
    def label: String = s"accepted_values($col)"
  }

  /** Non-null values of `col` (cast to long) must lie in [lo, hi]. */
  final case class InRange(col: String, lo: Long, hi: Long) extends Constraint {
    require(lo <= hi, s"InRange: lo $lo > hi $hi")
    def label: String = s"in_range($col)"
  }

  /** Non-null values of `col` must exist in `dim.dimCol` (referential
   * integrity; orphan count). NULL FKs are NotNull's business.
   * `broadcastDim = false` switches the anti join to a plain shuffle
   * join for a dimension too large to broadcast. */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String,
      broadcastDim: Boolean = true) extends Constraint {
    def label: String = s"ref_integrity($col)"
  }

  /**
   * Audit `df` against `constraints`. Output, one row per constraint
   * in the input order: (`constraint`, `violations`, `n_rows`) with
   * `n_rows` the audited table's row count (same for every row — the
   * denominator a violation-RATE alert wants).
   */
  def audit(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "audit needs at least one constraint")
    val spark = df.sparkSession
    import spark.implicits._

    // one conditional-aggregate pass: n_rows + every row-local count
    val rowLocal: Seq[(String, Column)] = constraints.collect {
      case c @ NotNull(col0) =>
        c.label -> sum(when(col(col0).isNull, 1L).otherwise(0L))
      case c @ AcceptedValues(col0, vs) =>
        c.label -> sum(when(col(col0).isNotNull &&
          !col(col0).cast("string").isin(vs: _*), 1L).otherwise(0L))
      case c @ InRange(col0, lo, hi) =>
        c.label -> sum(when(col(col0).isNotNull &&
          (col(col0).cast("long") < lo || col(col0).cast("long") > hi), 1L)
          .otherwise(0L))
    }
    val aggCols = count(lit(1)).as("__n") +:
      rowLocal.zipWithIndex.map { case ((_, c), i) => c.as(s"__c$i") }
    val aggRow = df.agg(aggCols.head, aggCols.tail: _*).head()
    val nRows = aggRow.getLong(0)
    val rowLocalCounts: Map[String, Long] = rowLocal.zipWithIndex.map {
      case ((label, _), i) =>
        label -> (if (aggRow.isNullAt(i + 1)) 0L else aggRow.getLong(i + 1))
    }.toMap

    // per-constraint single-row counts for the non-row-local classes;
    // each is a bounded driver scalar (the dims/keys never collect)
    val counts: Seq[(String, Long)] = constraints.map {
      case c if rowLocalCounts.contains(c.label) => c.label -> rowLocalCounts(c.label)
      case c @ Unique(cols0) =>
        val r = df.agg(count(lit(1)).as("n"),
          count_distinct(struct(cols0.map(col): _*)).as("d")).head()
        c.label -> (r.getLong(0) - r.getLong(1))
      case c @ RefIntegrity(col0, dim, dimCol, bcast) =>
        val dimKeys = dim.select(col(dimCol).as("__fk")).distinct()
        val orphans = df.select(col(col0).as("__fk")).filter(col("__fk").isNotNull)
          .join(if (bcast) broadcast(dimKeys) else dimKeys, Seq("__fk"), "left_anti")
          .count()
        c.label -> orphans
      case c => throw new IllegalStateException(s"unhandled constraint $c")
    }
    counts.toDF("constraint", "violations")
      .withColumn("n_rows", lit(nRows))
  }
}
