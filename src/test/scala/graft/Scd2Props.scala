package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.operators.Scd2

/** Randomized contracts for SCD2: the single-window build must agree
  * with a per-key brute-force reference on arbitrary logs (collisions
  * included), and incremental maintenance must equal the full rebuild
  * at an arbitrary append-ordered split. */
object Scd2Props extends Properties("Scd2") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  // small domains force key and timestamp collisions
  private val rowGen = Gen.zip(
    Gen.choose(1L, 4L), Gen.choose(0L, 10L), Gen.choose(0L, 99L))
  private val logGen = Gen.nonEmptyListOf(rowGen)
    .map(_.zipWithIndex.map { case ((k, ts, attr), i) =>
      (k, ts, i.toLong, s"v$attr")
    })

  private val cols = Seq("k", "ts", "seq", "attr", "valid_from", "valid_to", "is_current")

  private def build(rows: List[(Long, Long, Long, String)]) =
    Scd2.fromChangeLog(rows.toDF("k", "ts", "seq", "attr"), "k", "ts", "seq")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet

  property("fromChangeLog == per-key brute force (dedup, chaining, open tail)") =
    Prop.forAll(logGen) { rows =>
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, keyRows) =>
        val accepted = keyRows.groupBy(_._2).map(_._2.maxBy(_._3)).toSeq.sortBy(_._2)
        accepted.zip(accepted.drop(1).map(r => Option(r._2)) :+ None).map {
          case ((k, ts, seq, attr), next) =>
            Seq[Any](k, ts, seq, attr, ts, next.orNull, next.isEmpty)
        }
      }.toSet
      build(rows) == want
    }

  property("applyChanges == full rebuild at an append-ordered split") =
    Prop.forAll(logGen, Gen.choose(0.0, 1.0)) { (rows, frac) =>
      // split per key on the timestamp axis so the increment is newer
      // than (or tied with) each key's open row — the documented
      // append-only contract
      val cut = (rows.map(_._2).min + frac *
        (rows.map(_._2).max - rows.map(_._2).min + 1)).toLong
      val hist = rows.filter(_._2 < cut)
      val inc = rows.filter(_._2 >= cut)
      (hist.nonEmpty && inc.nonEmpty) ==> {
        val dim = Scd2.fromChangeLog(hist.toDF("k", "ts", "seq", "attr"), "k", "ts", "seq")
        val got = Scd2.applyChanges(dim, inc.toDF("k", "ts", "seq", "attr"), "k", "ts", "seq")
          .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
        got == build(rows)
      }
    }
}
