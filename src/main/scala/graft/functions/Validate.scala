package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the pre-training gate a 100 TB
  * corpus pipeline runs before anything expensive reads a snapshot
  * (schema-level constraints in the Deequ/Great-Expectations family,
  * computed Spark-first): completeness, uniqueness, bounds, set
  * membership, and pattern checks all collapse into ONE aggregate over
  * ONE scan of the table — adding a check adds a column to the
  * aggregate, never a pass over the data — and referential integrity is
  * one left join whose parent side carries only distinct keys (dim-
  * table-sized, broadcastable). The report is exact-integer (violation
  * counts, not sampled estimates), so it doubles as a differential
  * gate face.
  *
  * The reference has no validation operator (bytewax routes checks
  * through user lambdas); this is brief-mandated pipeline surface in
  * the quality family beside the Gopher rules ([[Text.gopherStats]])
  * and the classifier/LM scorers — those judge DOCUMENTS, this judges
  * the RELATION (nulls, key collisions, out-of-range facts, orphaned
  * references).
  */
object Validate {

  /** One declarative constraint. `violations` is the constraint's
    * violation-count aggregate — every check is a single aggregate
    * expression, which is what keeps the whole report one scan.
    */
  sealed trait Check {
    def kind: String
    def column: String
    private[functions] def violations: Column
  }

  /** Completeness: `column` must never be null. */
  final case class NotNull(column: String) extends Check {
    val kind = "not_null"
    private[functions] def violations: Column = count(when(col(column).isNull, 1))
  }

  /** Uniqueness: no two rows share a non-null value of `column`.
    * Violations = excess duplicate rows (`count(col) − distinct(col)`,
    * non-null scope — null completeness is [[NotNull]]'s job). The
    * exact distinct rides the same aggregate via Spark's expand
    * rewrite: still one scan, one (expanded) exchange.
    */
  final case class Unique(column: String) extends Check {
    val kind = "unique"
    private[functions] def violations: Column =
      count(col(column)) - count_distinct(col(column))
  }

  /** Composite-key uniqueness: no two rows share the same tuple of
    * `columns` values — the real primary-key check (single-column
    * [[Unique]] is the degenerate case; most fact tables key on a
    * tuple, e.g. (orderkey, linenumber)). Scope: rows where EVERY key
    * part is non-null (SQL distinct treats NULLs as equal, which would
    * report legitimate null rows as duplicates); completeness of the
    * parts is [[NotNull]]'s job. Violations = excess rows beyond one
    * per distinct tuple.
    */
  final case class UniqueTuple(columns: Seq[String]) extends Check {
    require(columns.nonEmpty, "UniqueTuple: no columns")
    val kind = "unique_tuple"
    def column: String = columns.mkString(",")
    private[functions] def violations: Column = {
      val allSet = columns.map(c => col(c).isNotNull).reduce(_ && _)
      val tuple = struct(columns.map(col): _*)
      count(when(allSet, 1)) - count_distinct(when(allSet, tuple))
    }
  }

  /** Range: non-null values must satisfy `lo <= column <= hi`. Nulls
    * are not violations here ([[NotNull]] owns completeness), matching
    * SQL three-valued logic.
    */
  final case class Bounds(column: String, lo: Double, hi: Double) extends Check {
    require(lo <= hi, s"Bounds($column): lo $lo > hi $hi")
    val kind = "bounds"
    private[functions] def violations: Column =
      count(when(col(column) < lit(lo) || col(column) > lit(hi), 1))
  }

  /** Set membership: non-null values must be one of `values`. */
  final case class InSet(column: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, s"InSet($column): empty value set")
    val kind = "in_set"
    private[functions] def violations: Column =
      count(when(col(column).isNotNull && !col(column).isin(values: _*), 1))
  }

  /** Pattern: non-null values must match `regex` (Spark `rlike`
    * semantics — unanchored contains-match; anchor with ^$ for a full
    * match, which also keeps the oracle rendering engine-agnostic).
    */
  final case class Pattern(column: String, regex: String) extends Check {
    val kind = "pattern"
    private[functions] def violations: Column =
      count(when(col(column).isNotNull && !col(column).rlike(regex), 1))
  }

  private val ReportCols = Seq("kind", "col_name", "violations", "total", "passed")

  /** Run every check in ONE aggregate over one scan: the report is
    * `(kind, col_name, violations, total, passed)`, one row per check.
    * The single-row aggregate unpivots via `stack` (a projection over
    * one row — no second action, no driver loop).
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "report: no checks given")
    val aggCols = count(lit(1)).as("__total") +:
      checks.zipWithIndex.map { case (c, i) => c.violations.as(s"__v$i") }
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs: Seq[Column] = checks.zipWithIndex.flatMap { case (c, i) =>
      Seq(lit(c.kind), lit(c.column), col(s"__v$i"))
    }
    row.select(
        stack((lit(checks.length) +: stackArgs): _*).as(Seq("kind", "col_name", "violations")),
        col("__total").as("total"))
      .select(col("kind"), col("col_name"), col("violations"), col("total"),
        (col("violations") === 0L).as("passed"))
  }

  /** Referential integrity: every non-null `childCol` must exist in
    * `parent(parentCol)`. One row in the report schema. Shape: the
    * parent side reduces to DISTINCT KEYS before the join (dim-sized —
    * broadcastable when small, hash-keyed otherwise) and the verdict is
    * one left join + one aggregate; the child never shuffles twice.
    */
  def fkReport(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String): DataFrame = {
    val pk = parent.select(col(parentCol).as("__pk")).distinct()
    child.select(col(childCol).as("__ck"))
      .join(pk, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("total"),
        count(when(col("__ck").isNotNull && col("__pk").isNull, 1)).as("violations"))
      .select(lit("foreign_key").as("kind"), lit(childCol).as("col_name"),
        col("violations"), col("total"), (col("violations") === 0L).as("passed"))
  }

  /** Gate form: compute the report and THROW if any check failed —
    * the "refuse to start the training run on a bad snapshot" switch.
    * The collect is bounded by the number of checks, never the data.
    */
  def requireValid(df: DataFrame, checks: Seq[Check]): Unit = {
    val failed = report(df, checks).filter(!col("passed"))
      .select(col("kind"), col("col_name"), col("violations"))
      .collect()
    if (failed.nonEmpty) {
      val msg = failed.map(r => s"${r.getString(0)}(${r.getString(1)}): " +
        s"${r.getLong(2)} violations").mkString("; ")
      throw new IllegalStateException(s"validation failed: $msg")
    }
  }
}
