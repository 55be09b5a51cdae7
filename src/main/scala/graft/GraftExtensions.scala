package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BitsetTest, VecDot}
import graft.plans.{GroupTopKRewrite, GroupTopKStrategy}

/** Engine extensions, registered via `spark.sql.extensions` (the public
  * `SparkSessionExtensions` hook — set in [[GraftSession.builder]]):
  *
  *  - the codegen'd `vec_dot` vector kernel ([[VecDot]]), callable from SQL
  *    and from `functions.call_function("vec_dot", ...)`;
  *  - the codegen'd `bitset_test` packed-bitset probe ([[BitsetTest]]) —
  *    the O(1)-per-probe Bloom membership test;
  *  - the [[graft.plans.GroupTopK]] rewrite: an optimizer rule turning the
  *    `row_number() <= k` window pattern into a bounded top-k-per-group
  *    operator, plus the planner strategy for its partial/final physical
  *    form (gate: `spark.graft.topk.rewrite.enabled`, default true).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"vec_dot expects 2 arguments, got ${children.length}")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("bitset_test"),
      new ExpressionInfo(classOf[BitsetTest].getName, "bitset_test"),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"bitset_test expects 2 arguments, got ${children.length}")
        BitsetTest(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => new GroupTopKRewrite)
    ext.injectPlannerStrategy(_ => GroupTopKStrategy)
  }
}
