package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

/** `SparkSessionExtensions` entry point: registers graft's custom Catalyst
  * expressions with the SQL function registry, so `spark.sql(...)` and
  * `expr(...)` callers get them too (not just the Column API).
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Custom plans/rules: ONE optimizer rule — [[CollapseRecodeUdf]], which
  * rewrites a declarative recode-UDF into `CaseWhen` so filters on the
  * recoded column fold back to pushable raw-column predicates (SURVEY
  * §4.2's candidate; before/after plan assert in RecodeRuleSpec) — and
  * ONE planner strategy — [[AsOfJoinStrategy]], planning
  * [[AsOfJoinNode]] as the streaming [[SortMergeAsOfJoinExec]]
  * (narrow-shuffle as-of join; parity with the composed face pinned by
  * AsOfMergeProps). Everything else stayed expressible through built-in
  * operators (composition first, custom `Expression` second). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CollapseRecodeUdf)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot takes 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }))

    // Composed functions built as catalyst trees directly (a Column
    // lowered inside a function builder stays unresolved — it never
    // re-enters analysis), mirroring the Column-API definitions in
    // Similarity.cosine and TextFunctions.jaccard.
    import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Divide, Multiply, Sqrt}
    import org.apache.spark.sql.types.{ArrayType, DoubleType}

    def two(name: String)(f: (Expression, Expression) => Expression) =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name),
        (args: Seq[Expression]) => {
          require(args.length == 2, s"$name takes 2 arguments, got ${args.length}")
          f(args.head, args(1))
        }))

    two("graft_cosine") { (a0, b0) =>
      val a = Cast(a0, ArrayType(DoubleType))
      val b = Cast(b0, ArrayType(DoubleType))
      Divide(DotProduct(a, b),
        Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
    }

    two("graft_jaccard") { (a, b) =>
      import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, Size}
      Divide(
        Cast(Size(ArrayIntersect(a, b)), DoubleType),
        Cast(Size(ArrayDistinct(Concat(Seq(a, b)))), DoubleType))
    }
  }
}
