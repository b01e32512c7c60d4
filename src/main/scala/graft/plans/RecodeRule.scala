package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, CaseWhen, EqualTo, Expression, In, IsNotNull, IsNull, Literal, Not,
  Or, ScalaUDF}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** A literal key→value recode carried as a plain Scala function — the
  * shape legacy pipelines ship as a UDF (the reference's `keyMap`
  * recodings, SURVEY §2.4, arrive exactly like this when users port
  * them mechanically). As a `ScalaUDF` it is OPAQUE to Catalyst: a
  * filter on the recoded column can never fold back to a predicate on
  * the raw column, so nothing reaches the parquet scan and a 100 TB
  * read scans everything. The mapping rides along declaratively so
  * [[CollapseRecodeUdf]] can rewrite the call into an equivalent
  * `CASE WHEN` chain that Catalyst's own rules (PushFoldableIntoBranches,
  * SimplifyConditionals, predicate pushdown) then collapse and push.
  *
  * Mapping is an ordered Seq with distinct keys so the UDF face and the
  * CaseWhen face agree on first-match semantics by construction. */
case class RecodeFn(mapping: Seq[(String, String)], default: Option[String])
    extends (String => String) with Serializable {
  require(mapping.map(_._1).distinct.size == mapping.size,
    "RecodeFn: mapping keys must be distinct")
  // the optimizer rule lifts keys/values into Literals AFTER analysis,
  // where nothing re-checks types — a null would mint a NullType literal
  // inside a StringType CaseWhen. Reject up front; scrub-to-null is a
  // separate when(...).otherwise(null) step, not a recode.
  require(mapping.forall { case (k, v) => k != null && v != null },
    "RecodeFn: mapping keys and values must be non-null")
  require(default.forall(_ != null),
    "RecodeFn: default must not be Some(null); use None for identity passthrough")
  private val m = mapping.toMap
  override def apply(s: String): String =
    if (s == null) null else m.getOrElse(s, default.getOrElse(s))
}

object Recode {
  /** The user-facing UDF: behaves identically with or without the
    * optimizer rule; the rule only changes the PLAN (and what the scan
    * can prune). */
  def recodeUdf(mapping: Seq[(String, String)], default: Option[String]): UserDefinedFunction =
    functions.udf(RecodeFn(mapping, default))
}

/** `Rule[LogicalPlan]` exercising the [[GraftExtensions]] injection
  * point (SURVEY §4.2's candidate): collapse a [[RecodeFn]] `ScalaUDF`
  * into the equivalent `CaseWhen` chain. Injected into the operator-
  * optimization batch, so in the SAME fixed point Catalyst then folds
  * `recoded = 'x'` through the branches into a raw-column predicate and
  * pushes it into the scan — `PushedFilters` on the parquet relation is
  * the before/after assert in RecodeRuleSpec.
  *
  * Semantics parity with the UDF face, branch by branch:
  *  - null input → null (leading IsNull branch; the UDF returns null),
  *  - mapped key → its value, first match wins (distinct keys enforced),
  *  - unmapped key → `default`, or the input itself when None. */
object CollapseRecodeUdf extends Rule[LogicalPlan] {

  private def isRecode(u: ScalaUDF): Boolean =
    u.function.isInstanceOf[RecodeFn] && u.children.size == 1

  /** `recode(key) = 'v'` as a predicate on the RAW column. Case analysis
    * mirrors [[RecodeFn.apply]] exactly — INCLUDING the null lattice: the
    * UDF face gives recode(null) = null, and null = 'v' is NULL, so every
    * disjunct here must yield NULL (not false) on a null key, or a
    * negated filter (`!(recode(k) = 'v')`) and a projected comparison
    * would diverge from the UDF. EqualTo and Not(In) propagate null
    * natively; the no-disjunct fallback uses And(IsNull, null) — null on
    * null key, false otherwise. Catalyst's OptimizeIn then usually packs
    * the disjunction into one pushable `In`. A multi-branch boolean
    * CaseWhen would NOT get here on its own —
    * SimplifyConditionalsInPredicate only folds single-branch shapes —
    * which is why the comparison is matched directly instead of leaning
    * on the generic rewrite below. */
  private def recodeEq(u: ScalaUDF, v: String): Expression = {
    val f = u.function.asInstanceOf[RecodeFn]
    val key = u.children.head
    // mapped keys whose recoded value is v
    val hit: Seq[Expression] =
      f.mapping.filter(_._2 == v).map { case (k, _) => EqualTo(key, Literal(k)) }
    val mappedKeys = f.mapping.map(_._1)
    // unmapped keys: value is `default`, or the key itself when None
    val unmapped: Seq[Expression] = f.default match {
      case Some(d) if d == v =>
        if (mappedKeys.isEmpty)
          // empty mapping: every NON-NULL key recodes to the default —
          // Or(IsNotNull, null) is true for non-null keys and NULL for
          // null keys. Not(In(key, Nil)) would NOT work: Catalyst folds
          // an empty In to plain FALSE (not null-aware), so Not of it
          // becomes TRUE even for null keys (found by RecodeRuleProps).
          Seq(Or(IsNotNull(key),
            Literal.create(null, org.apache.spark.sql.types.BooleanType)))
        else
          // Not(In) alone: null key → In null → Not null = NULL, matching
          // the UDF; an IsNotNull CONJUNCT here would turn that NULL into
          // FALSE and break negation/projection parity
          Seq(Not(In(key, mappedKeys.map(Literal(_)))))
      case None if !mappedKeys.contains(v) => Seq(EqualTo(key, Literal(v)))
      case _ => Nil
    }
    (hit ++ unmapped).reduceOption(Or).getOrElse(
      And(IsNull(key), Literal.create(null, org.apache.spark.sql.types.BooleanType)))
  }

  private def isNonNullStringLit(e: Expression): Boolean = e match {
    case Literal(v, StringType) => v != null
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // top-down traversal: the comparison shapes win over the generic
    // rewrite at the same node, turning the filter into scan-pushable
    // raw-column predicates
    case EqualTo(u: ScalaUDF, Literal(v: UTF8String, StringType)) if isRecode(u) =>
      recodeEq(u, v.toString)
    case EqualTo(Literal(v: UTF8String, StringType), u: ScalaUDF) if isRecode(u) =>
      recodeEq(u, v.toString)
    // recode(k) IN (v1..vm) with all-literal non-null values ≡ OR of the
    // per-value rewrites (a null in the list would make In yield null
    // instead of false on a miss — observable outside Filter, so those
    // fall through to the generic CaseWhen rewrite)
    case In(u: ScalaUDF, values) if isRecode(u) && values.nonEmpty &&
        values.forall(isNonNullStringLit) =>
      values.map { case Literal(v, StringType) =>
        recodeEq(u, v.asInstanceOf[UTF8String].toString)
      }.reduce(Or)
    case u: ScalaUDF if isRecode(u) =>
      val f = u.function.asInstanceOf[RecodeFn]
      val key = u.children.head
      val branches = (IsNull(key), Literal.create(null, StringType)) +:
        f.mapping.map { case (k, v) => (EqualTo(key, Literal(k)), Literal(v)) }
      CaseWhen(branches, Some(f.default.map(Literal(_): Expression).getOrElse(key)))
  }
}
