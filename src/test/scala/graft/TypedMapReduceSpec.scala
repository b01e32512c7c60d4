package graft

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

import graft.folds.Aggregators
import graft.mapreduce.TypedMapReduce

case class Rec(label: String, x: Double, y: Double)

class TypedMapReduceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed mapReduce: full-generality unpack/assign/reduce") {
    val ds = Seq(Rec("A", 1, 10), Rec("A", 2, 20), Rec("B", 3, 30), Rec("D", 9, 90)).toDS()
    val out = TypedMapReduce.mapReduce(ds)(
      unpack = r => if (r.label != "D") Some(r) else None,
      assign = r => (r.label, r.x + r.y),
      reduce = (k: String, vs: Iterator[Double]) => Iterator.single(k -> vs.sum))
      .collect().toMap
    assert(out == Map("A" -> 33.0, "B" -> 33.0))
  }

  test("typed foldAndAddKey: Aggregator path with map-side combine") {
    val ds = Seq(Rec("A", 2, 1), Rec("A", 4, 3), Rec("B", 5, 1)).toDS()
    val wm = Aggregators.fold[Rec, (Double, Double), Double](
      (0.0, 0.0),
      (b, r) => (b._1 + r.x * r.y, b._2 + r.y),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      b => b._1 / b._2)(
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble), Encoders.scalaDouble)
    val out = TypedMapReduce.foldAndAddKey(ds)(_.label, wm, (k: String, v: Double) => (k, v))
      .collect().toMap
    assert(out("A") == (2 * 1 + 4 * 3) / 4.0 && out("B") == 5.0)
  }
}
