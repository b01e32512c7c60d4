package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r15, guide §1): decompose x36_interval_overlap into stages
  * and time each with the noop sink — which piece of the 4.7 s is scan,
  * explode, join, aggregate? Not part of the driver contract. */
object ProbeX36 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val els = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-28s min ${els.min}%7.3f s of ${els.map(e => f"$e%.2f").mkString("/")}")
    }
    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"),
        unix_timestamp(col("l_shipdate")).as("l_start"),
        (unix_timestamp(col("l_shipdate")) +
          (lit(1L) + col("l_linenumber") % 30) * 86400L).as("l_end"))
    def iv = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_totalprice") > 450000.0)
      .select(col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_start"),
        (unix_timestamp(col("o_orderdate")) + 604800L).as("o_end"))
    def banded(df: org.apache.spark.sql.DataFrame, s: String, e: String, w: Long) =
      df.where(col(s) < col(e)).withColumn("__band",
        explode(sequence(floor(col(s).cast("long") / w),
          floor((col(e).cast("long") - 1) / w))))
    t("li_scan_project")(li)
    t("li_banded")(banded(li, "l_start", "l_end", 604800L))
    t("iv_banded")(banded(iv, "o_start", "o_end", 604800L))
    t("join_no_agg") {
      banded(iv, "o_start", "o_end", 604800L)
        .join(banded(li, "l_start", "l_end", 604800L), Seq("__band"))
        .where(col("o_start") < col("l_end") && col("l_start") < col("o_end") &&
          col("__band") === floor(greatest(col("o_start"), col("l_start")) / 604800L))
    }
    t("full_x36") {
      graft.SparkEntry.queries("x36_interval_overlap")(spark, sfDir)
    }
    spark.stop()
  }
}
