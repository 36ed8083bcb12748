package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayFilter, Expression, In, InSet, LambdaFunction, Literal, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: rewrite the natural-but-interpreted membership-count
  * pattern
  *
  *   `size(filter(words, x -> x IN ('the', 'a', ...)))`
  *
  * into the native codegen'd [[CountInSet]] — the user keeps writing
  * idiomatic Spark SQL/Column code and the plan gets the hash-set
  * expression graft's own operators use (higher-order functions are
  * CodegenFallback AND re-scan the IN-list per element). Matches both
  * `In` (literal list) and `InSet` (what `OptimizeIn` produces past the
  * conversion threshold); fires for any `array<string>` input.
  *
  * Registered by [[GraftExtensions]] (`injectOptimizerRule`) and on
  * running sessions via [[GraftExtensions.register]] — rule injection
  * is the third Catalyst extension point the library exercises, next to
  * native expressions (`doGenCode`) and SQL function registration.
  */
object RewriteCountInSet extends Rule[LogicalPlan] {

  private def stringSet(pred: Expression, v: NamedLambdaVariable): Option[Seq[String]] =
    pred match {
      case In(value, list)
          if value.semanticEquals(v) && list.nonEmpty &&
            list.forall(e => e.isInstanceOf[Literal] && e.dataType == StringType) =>
        Some(list.map(_.asInstanceOf[Literal].value)
          .map { case s: UTF8String => s.toString; case null => return None })
      case InSet(value, hset) if value.semanticEquals(v) =>
        if (hset.contains(null)) None
        else Some(hset.toSeq.map { case s: UTF8String => s.toString
                                   case other => return None })
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // null elements agree on both paths: IN(null) is null, so filter()
    // drops them; CountInSet's set.contains(null) is false — either
    // way a null element never counts.
    case s @ Size(ArrayFilter(arr, LambdaFunction(pred, Seq(v: NamedLambdaVariable), _)), _)
        if arr.dataType.isInstanceOf[ArrayType] &&
          arr.dataType.asInstanceOf[ArrayType].elementType == StringType =>
      stringSet(pred, v) match {
        case Some(strings) => CountInSet(arr, strings)
        case None => s
      }
  }
}
