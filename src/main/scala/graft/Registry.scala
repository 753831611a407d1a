package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (when the semantics
  * are SQL-expressible) a DuckDB oracle that must produce identical rows,
  * column names, and types on the same parquet tables.
  *
  * Cross-engine float determinism rules used throughout:
  *   - Sums of doubles go through `CAST(x AS DECIMAL(18,k))` first: decimal
  *     addition is exact and associative, so partial-aggregation order
  *     (Spark) vs sequential order (DuckDB) cannot diverge. Final value is
  *     cast back to DOUBLE (exact, deterministic).
  *   - double->decimal rounding ties are impossible for decimal scales >= 1
  *     (no binary fraction ends at an exact multiple of 5*10^-k), so both
  *     engines round identically.
  *   - Elementwise array math (dot products) is folded sequentially in array
  *     order on both sides -> bit-identical doubles.
  *   - Counts are BIGINT on both sides; `extract(...)` results are cast to a
  *     common integer type explicitly.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times */
    headline: Boolean = false)
