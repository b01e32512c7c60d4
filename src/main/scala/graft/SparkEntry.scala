package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionQueries, ParityQueries, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered in `graft.queries.*` (one per operator family
  * from SURVEY.md §2, plus the LLM-pipeline extension operators), each with
  * DuckDB oracle SQL when the semantics are SQL-expressible.
  */
object SparkEntry {

  private def registry: Seq[Q] = ParityQueries.all ++ ExtensionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own flagship (`Readme.md:104-117`): filter → group →
    * multi-column sum via the Unpack/Assign/Reduce pipeline. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_flagship")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    registry.collect { case Q(name, _, Some(sql)) => name -> sql.trim }.toMap
}
