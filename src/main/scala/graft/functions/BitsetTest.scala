package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd bit test over a packed `array<bigint>` bitset:
  * `bitset_test(words, pos)` is true iff bit `pos` of the little-endian
  * packed set (bit i lives in word i>>6 at offset i&63) is 1. Positions
  * outside the packed range read as 0 — the same answer an explicit
  * zero-extended bitset would give.
  *
  * This is the production form of [[graft.operators.SketchOps]]'s Bloom
  * membership probe: the portable `array_contains(sorted_positions, p)`
  * formulation scans O(set bits) per probe and carries the positions as a
  * variable-length array, while this expression reads ONE word and shifts —
  * O(1) per probe over a fixed m/64-word broadcast — and stays inside
  * whole-stage codegen (the [[VecDot]] rationale: built-ins first, then a
  * native `doGenCode` Expression, never a Scala UDF).
  */
case class BitsetTest(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bitset_test"

  // Analysis-time validation (NOT constructor-time: a constructor throw on
  // an unresolved child surfaces as an internal error instead of a proper
  // AnalysisException, and re-runs on every withNewChildrenInternal copy).
  // `ExpectsInputTypes`/`TypeCollection` are private[sql], so the check is
  // hand-rolled via the same hook the analyzer calls on every expression.
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) => right.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bitset_test expects an integral position, got ${other.simpleString}")
    }
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitset_test expects array<bigint> words, got ${other.simpleString}")
  }

  private def posIsInt: Boolean = right.dataType == IntegerType

  override def nullSafeEval(a: Any, p: Any): Any = {
    val words = a.asInstanceOf[ArrayData]
    val pos = if (posIsInt) p.asInstanceOf[Int].toLong else p.asInstanceOf[Long]
    val w = (pos >> 6).toInt
    if (pos < 0 || w >= words.numElements() || words.isNullAt(w)) false
    else ((words.getLong(w) >>> (pos & 63)) & 1L) == 1L
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, p) => {
      val pos = ctx.freshName("pos")
      val w = ctx.freshName("w")
      val posCast = if (posIsInt) s"(long) $p" else p
      s"""
         |final long $pos = $posCast;
         |final int $w = (int) ($pos >> 6);
         |${ev.value} = $pos >= 0 && $w < $a.numElements() && !$a.isNullAt($w)
         |  && ((($a.getLong($w)) >>> ($pos & 63)) & 1L) == 1L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitsetTest =
    copy(left = newLeft, right = newRight)
}
