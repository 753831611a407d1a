package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.operators.*` as `Q` entries; this object is
  * just the aggregation point the driver calls.
  */
object SparkEntry {

  def all: Seq[Q] =
    operators.Relational.defs ++
    operators.Dedup.defs ++
    operators.TextAnalysis.defs ++
    operators.Similarity.defs ++
    operators.Clustering.defs ++
    operators.Pipeline.defs ++
    operators.Graph.defs ++
    operators.Multimodal.defs ++
    operators.MediaDedup.defs ++
    graft.streaming.StreamingQueries.defs ++
    operators.PcapQueries.defs ++
    operators.WarcQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Subset Bench times (expensive/representative ones). */
  def headline: Seq[String] = all.filter(_.headline).map(_.name)
}
