package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("graft_dot is callable from SQL via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_cosine and graft_jaccard are SQL-callable and match their definitions") {
    val r = spark.sql(
      "SELECT graft_cosine(array(3.0d, 0.0d), array(3.0d, 0.0d)) AS self, " +
        "graft_cosine(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS orth, " +
        "graft_jaccard(array('a','b','c'), array('b','c','d')) AS j")
      .collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 0.5) < 1e-12)
  }

  test("graft_dot null propagation; dimension mismatch yields null, not a truncated dot") {
    val rows = spark.sql(
      "SELECT graft_dot(CAST(NULL AS array<double>), array(1.0d)) AS n, " +
        "graft_dot(array(1.0d, 2.0d), array(3.0d)) AS mismatched")
      .collect().head
    assert(rows.isNullAt(0))
    assert(rows.isNullAt(1))
  }
}
