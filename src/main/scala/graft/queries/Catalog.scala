package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One catalog entry: a Spark query plus (when SQL-expressible) the ANSI SQL
  * a DuckDB oracle runs over the same parquet tables. Column names/types and
  * row values must match the oracle exactly (driver hashes values after
  * sorting columns by name), so:
  *   - every aggregate/computed column is aliased identically on both sides;
  *   - money/double arithmetic goes through exact decimal and is cast to
  *     double only at the end (bit-identical across engines);
  *   - every query has a deterministic total ORDER BY on both sides.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  /** Exact 2-decimal view of a generated double column (all synthetic money/
    * quantity columns carry ≤2 decimals). Sums in decimal are
    * order-independent — safe under Spark's nondeterministic partial-agg
    * order at any scale, unlike double sums. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** Final cast back to double: nearest-double of an exact decimal is
    * deterministic and engine-independent. */
  def asDouble(c: Column): Column = c.cast("double")
}
