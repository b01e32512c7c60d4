package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.folds.Profile

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some("a"), 1.5), (2L, Some("b"), 2.5), (3L, None, 1.5), (4L, Some("a"), 0.5)
  ).toDF("id", "s", "v")

  test("profile: one row, exact counts/distincts/min/max per column") {
    val r = Profile.profile(df, Seq("id", "s", "v")).collect().head
    val m = r.schema.fieldNames.zip(r.toSeq).toMap
    assert(m("n_rows") == 4L)
    assert(m("id_count") == 4L && m("id_distinct") == 4L && m("id_min") == 1L && m("id_max") == 4L)
    assert(m("s_count") == 3L && m("s_distinct") == 2L && m("s_min") == "a" && m("s_max") == "b")
    assert(m("v_count") == 4L && m("v_distinct") == 3L && m("v_min") == 0.5 && m("v_max") == 2.5)
  }

  test("profile: approx path has no Expand in the plan (the 100 TB shape)") {
    val exact = Profile.profile(df, Seq("id", "s"), exactDistinct = true)
    val approx = Profile.profile(df, Seq("id", "s"), exactDistinct = false)
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("profile rejects non-orderable columns eagerly") {
    val arr = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    intercept[IllegalArgumentException](Profile.profile(arr, Seq("xs")))
  }
}
