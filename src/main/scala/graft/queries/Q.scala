package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when the
  * semantics are SQL-expressible) the equivalent DuckDB oracle SQL. Column
  * names MUST match between the two — the driver's compare sorts columns by
  * name before hashing. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) (TESTDATA is pyarrow-written);
    // Spark's reader rejects nanos unless they're read back as BIGINT.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet")
  }
}
