package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.ArrayType

/** Push element predicates through `explode` as an `exists` pre-filter.
  *
  *   Filter(p(elem), Generate(Explode(arr), outer=false, elem))
  *     ==>
  *   Filter(p(elem), Generate(..., Filter(exists(arr, x -> p(x)), child)))
  *
  * Why: a filter AFTER an explode runs once per ELEMENT — every token of
  * every document flows through the Generate before the predicate can
  * drop it. The rewritten plan drops non-matching ROWS before they
  * explode: for a needle-in-haystack query (the BM25 / term-lookup
  * shape: most docs contain no query term) the Generate's input shrinks
  * by orders of magnitude, and the exists() scan of the array is the
  * same per-element work the post-filter was already doing. Spark's own
  * InferFiltersFromGenerate only infers `size(arr) > 0 AND isnotnull`;
  * it never pushes the element predicate itself (SPARK-33544 removed
  * unsafe variants of this; the version here keeps the original Filter
  * in place, so it is a pure pre-filter, not a replacement — safe under
  * three-valued logic because in a Filter context a null `exists` and
  * "no surviving exploded row" agree).
  *
  * Soundness: only fires for non-outer Explode over an array, for
  * deterministic, subquery-free conjuncts whose references are EXACTLY
  * the exploded element. The original Filter stays, so any conjunct the
  * pre-filter over-approximates (it keeps a row if ANY element matches)
  * is still enforced per-element afterwards.
  *
  * Registered by [[graft.GraftExtensions]] via injectOptimizerRule; it
  * joins the operator-optimization fixpoint, so it must be IDEMPOTENT
  * there. Two guards enforce that:
  *
  *  1. a [[TreeNodeTag]] on the rewritten Generate. The structural
  *     check alone ping-pongs with PushDownPredicates: we insert the
  *     exists-Filter directly under the Generate, pushdown immediately
  *     moves it below a Project (rewriting it through aliases), the
  *     "is there a Filter right under me" check comes up empty, and the
  *     rule re-fires — forever, which is exactly an optimizer
  *     `Max iterations reached` warning. Tags survive both transform
  *     copies (transformDown does copyTagsFrom on rule output) and
  *     withNewChildren, so the mark stays put while the filter travels.
  *  2. the structural check, kept as a cheap backstop for the rare rule
  *     that rebuilds a nested Generate via bare case-class copy() and
  *     drops tags (e.g. ColumnPruning's unrequiredChildIndex update) —
  *     worst case there is one duplicated pre-filter, never a loop.
  */
object PushPredicateThroughExplode extends Rule[LogicalPlan] with PredicateHelper {

  private val Guarded = TreeNodeTag[Unit]("graft.pushPredicateThroughExplode.guarded")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond,
        g @ Generate(Explode(arr), _, false, _, Seq(elem), child))
        if arr.dataType.isInstanceOf[ArrayType] && arr.deterministic &&
          g.getTagValue(Guarded).isEmpty && !alreadyGuarded(child, arr) =>
      val pushable = splitConjunctivePredicates(cond).filter { p =>
        p.deterministic && !SubqueryExpression.hasSubquery(p) &&
          p.references == AttributeSet(elem :: Nil) &&
          // Never push a ScalaUDF into the exists() pre-filter.
          // HigherOrderFunctions are CodegenFallback, so the guard row
          // runs INTERPRETED: the array expression (for a computed arr
          // like the decontam gram pipeline, the whole
          // split+transform+concat_ws chain) re-evaluates per row
          // outside codegen, and the UDF fires once per element in the
          // guard and again per exploded row. Measured on
          // pipe_decontam_bloom at the sf10 tier: 724.8 s with this
          // rewrite vs ~46 s without — a 16x pessimization of exactly
          // the entry the rule was never aimed at. Cheap codegen-able
          // element predicates (the BM25 term-lookup shape) still push.
          !p.exists(_.isInstanceOf[ScalaUDF])
      }
      if (pushable.isEmpty) f
      else {
        val at = arr.dataType.asInstanceOf[ArrayType]
        val x = NamedLambdaVariable("pte_elem", at.elementType, at.containsNull)
        val elemPred = pushable.reduce(And).transform {
          case a: Attribute if a.exprId == elem.exprId => x
        }
        val exists = new ArrayExists(arr, LambdaFunction(elemPred, Seq(x)))
        val guarded = g.copy(child = Filter(exists, child))
        guarded.copyTagsFrom(g)
        guarded.setTagValue(Guarded, ())
        Filter(cond, guarded)
      }
  }

  /** True if a structurally equivalent exists-guard is already in place
    * directly under the Generate (keeps the fixpoint idempotent). */
  private def alreadyGuarded(child: LogicalPlan, arr: Expression): Boolean =
    child match {
      case Filter(c, _) =>
        c.exists {
          case ae: ArrayExists => ae.argument.semanticEquals(arr)
          case _ => false
        }
      case _ => false
    }
}
