package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.folds.{Folds, NamedAgg}
import graft.mapreduce.{Assign, MapReduce, Reduce, Unpack}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every entry in [[queries]] instantiates one operator family from
  * SURVEY.md §2 on the driver's parquet test tables; [[oracleSql]] holds the
  * DuckDB-equivalent SQL for the correctness gate.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own flagship (`Readme.md:104-117`): filter → group →
    * multi-column sum, via the Unpack/Assign/Reduce pipeline. */
  def entry(spark: SparkSession): DataFrame =
    q1Flagship(spark, "/root/testdata/sf0.001")

  private def q1Flagship(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    MapReduce(
      li,
      Unpack.filterOnField("l_returnflag")(_.isin("A", "R")),
      Assign.KeysAndData(Seq("l_returnflag", "l_linestatus"), Seq("l_quantity", "l_extendedprice")),
      Reduce.FoldAndAddKey(Seq(
        NamedAgg("sum_qty", sum(col("l_quantity"))),
        NamedAgg("sum_price", sum(col("l_extendedprice"))),
        Folds.recFieldF("revenue", sum, col("l_extendedprice") * (lit(1.0) - col("l_discount"))))))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_flagship" -> ((s, dir) => q1Flagship(s, dir))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_flagship" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  sum(l_extendedprice) AS sum_price,
        |  sum(l_extendedprice * (1.0 - l_discount)) AS revenue
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R')
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
