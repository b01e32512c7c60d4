package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.operators.Reconcile

/** Randomized equivalence of the distributed diff against a local
  * reference: for arbitrary before-tables and arbitrary mutation sets
  * (drops, value edits, inserts), every key's status and changed-column
  * attribution must match the in-memory computation. */
object ReconcileProps extends Properties("Reconcile") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowGen = for {
    id <- Gen.choose(0L, 40L)
    name <- Gen.option(Gen.oneOf("a", "b", "c"))
    v <- Gen.choose(0, 5).map(_.toDouble)
  } yield (id, name, v)

  private val caseGen = for {
    beforeRows <- Gen.listOfN(25, rowGen).map(_.distinctBy(_._1))
    dropped <- Gen.someOf(beforeRows.map(_._1))
    edited <- Gen.someOf(beforeRows.map(_._1))
    inserts <- Gen.listOfN(5, rowGen).map(
      _.distinctBy(_._1).filterNot(r => beforeRows.exists(_._1 == r._1)))
  } yield (beforeRows, dropped.toSet, edited.toSet, inserts)

  property("status and changed_cols match a local reference diff") =
    forAll(caseGen) { case (beforeRows, dropped, edited, inserts) =>
      val afterRows = beforeRows
        .filterNot(r => dropped.contains(r._1))
        .map { case r @ (id, name, v) =>
          if (edited.contains(id)) (id, name, v + 1.0) else r
        } ++ inserts
      val got = Reconcile.detail(
        beforeRows.toDF("id", "name", "v"), afterRows.toDF("id", "name", "v"), Seq("id"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2))).toMap
      val beforeMap = beforeRows.map(r => r._1 -> r).toMap
      val afterMap = afterRows.map(r => r._1 -> r).toMap
      val expect = (beforeMap.keySet ++ afterMap.keySet).map { id =>
        id -> ((beforeMap.get(id), afterMap.get(id)) match {
          case (None, Some(_)) => ("added", Seq.empty[String])
          case (Some(_), None) => ("removed", Seq.empty[String])
          case (Some(b), Some(a)) =>
            val ch = Seq(
              if (b._2 != a._2) Some("name") else None,
              if (b._3 != a._3) Some("v") else None).flatten
            (if (ch.nonEmpty) "changed" else "unchanged", ch)
          case (None, None) => throw new IllegalStateException
        })
      }.toMap
      got == expect
    }
}
