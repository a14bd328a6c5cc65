package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the cross-engine polynomial string hash
  * `fold((acc * 31 + charCode) mod 1e9+7)` (see graft.operators.Text
  * .polyHash). The higher-order-function form splits the string into
  * per-character rows and interprets a lambda per character — measured at
  * tens of CPU-seconds over a 5000-doc corpus — while this is a tight byte
  * loop inside whole-stage codegen.
  *
  * CONTRACT: ASCII input only (identical to the HOF form's contract, which
  * this must stay bit-equal to — the spec suite asserts it). On ASCII the
  * UTF-8 byte value IS the character code both engines hash; beyond 0x7F
  * the byte fold, the UTF-16 fold and DuckDB's code-point fold all diverge.
  */
case class PolyHashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * 31L + (s.getByte(i) & 0xFF)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $s.numBytes();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * 31L + ($s.getByte($i) & 0xFF)) % 1000000007L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

object PolyHashExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PolyHashExpr].getName, "graft_polyhash")
}
