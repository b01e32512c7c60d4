package graft

import org.apache.spark.sql.functions.{col, udf}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.plans.Recode

/** Randomized differential testing of [[graft.plans.CollapseRecodeUdf]]:
  * for ARBITRARY mappings/defaults and data (nulls, astral symbols,
  * mapped/unmapped keys, values colliding with keys), the declarative
  * recode must agree with an opaque UDF carrying the identical function
  * in every observable face — projection (null vs false IS observable
  * there), positive filter, negated filter, and IN-list filter. The
  * hand-built cases in RecodeRuleSpec pin the known disjunct shapes;
  * these properties search for unknown ones across the whole parameter
  * space (hit/default/identity/fallback × null/mapped/unmapped). */
object RecodeRuleProps extends Properties("RecodeRule") {
  // A DEDICATED session with ConvertToLocalRelation excluded: the shared
  // session would evaluate Filter/Project over these local-Seq fixtures
  // eagerly with the raw UDF, before the injected rule runs — making
  // every parity property vacuous (see RecodeRuleSpec.parquetBacked for
  // the discovery story; exclusion keeps the per-case cost at
  // milliseconds where a parquet round trip per ScalaCheck case would
  // not). The UDF reference face is unaffected: it computes the same
  // function either way.
  private lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    s
  }
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val smile = new String(Character.toChars(0x1F600))
  // small alphabet so keys, values, and probe values collide often —
  // collisions (a value that is also a key, a default equal to a mapped
  // value) are exactly where the rewrite's case analysis can go wrong
  private val tokens = Seq("a", "b", "c", "é", smile)
  private val tokenGen: Gen[String] = Gen.oneOf(tokens)

  private val mappingGen: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(0, 4)
    keys <- Gen.pick(n, tokens)
    vals <- Gen.listOfN(n, tokenGen)
  } yield keys.toSeq.zip(vals)

  private val defaultGen: Gen[Option[String]] =
    Gen.option(tokenGen)

  private val dataGen: Gen[List[Option[String]]] = for {
    n <- Gen.choose(1, 8)
    xs <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(None), tokenGen.map(Some(_)), Gen.const(Some("zz_unmapped"))))
  } yield xs

  property("declarative recode == opaque UDF on projection and all filter faces") =
    Prop.forAll(mappingGen, defaultGen, dataGen, tokenGen) { (mapping, default, data, v) =>
      val m = mapping.toMap
      val opaque = udf((s: String) =>
        if (s == null) null else m.getOrElse(s, default.getOrElse(s)))
      val declared = Recode.recodeUdf(mapping, default)
      val df = data.zipWithIndex.map { case (s, i) => (i.toLong, s.orNull) }
        .toDF("id", "k")

      def rows(c: org.apache.spark.sql.Column): Seq[(Long, Any)] =
        df.select(col("id"), c.as("r")).orderBy("id")
          .collect().map(r => (r.getLong(0), r.get(1))).toSeq
      def ids(c: org.apache.spark.sql.Column): Set[Long] =
        df.where(c).select("id").as[Long].collect().toSet

      val proj = Prop(rows(opaque(col("k"))) == rows(declared(col("k")))) :| "projection"
      val projCmp = Prop(
        rows(opaque(col("k")) === v) == rows(declared(col("k")) === v)) :| s"projected =$v"
      val filt = Prop(
        ids(opaque(col("k")) === v) == ids(declared(col("k")) === v)) :| s"filter =$v"
      val neg = Prop(
        ids(!(opaque(col("k")) === v)) == ids(!(declared(col("k")) === v))) :| s"negated =$v"
      val inl = Prop(
        ids(opaque(col("k")).isin(v, "b")) ==
          ids(declared(col("k")).isin(v, "b"))) :| s"isin($v, b)"
      proj && projCmp && filt && neg && inl
    }
}
