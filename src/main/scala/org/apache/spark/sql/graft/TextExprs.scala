package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text hot paths that profiling showed
  * dominant AFTER the sketch expressions landed (stage listener on the PTJ
  * jaccard at sf0.1): word-shingle construction (split + transform + slice +
  * array_join interpreted per shingle: ~30 CPU-s per corpus pass) and the
  * polynomial array fold used for segment/band keys (aggregate lambda per
  * element inside an ObjectHashAggregate: another ~30 CPU-s). Both are
  * bit-equal to their HOF twins (spec-asserted), so DuckDB oracles are
  * unaffected.
  */

/** Distinct word n-grams of a space-separated string — the native form of
  * `Text.shingles`. Exactly mirrors
  * `array_distinct(transform(sequence(0, size(words)-n),
  *   i -> array_join(slice(words, i+1, n), " ")))` with
  * `words = split(text, " ")`: consecutive spaces yield empty words, a
  * trailing space yields a trailing empty word, and a shingle is the exact
  * byte span from the start of word i to the end of word i+n-1 (separators
  * are single spaces, so the joined form IS the span). Distinct keeps first
  * occurrence, like array_distinct.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle size must be >= 1")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TextExprHelpers.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = org.apache.spark.sql.graft.TextExprHelpers.wordShingles($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

object WordShinglesExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShinglesExpr].getName, "graft_shingles")
}

/** `fold((acc * mult + v) pmod p)` over an array<long> with an expression
  * seed — the segment-key / LSH-band-key fold, natively. Bit-equal to
  * `aggregate(arr, seed, (acc, v) -> pmod(acc * mult + v, p))` including
  * the null-element case (any null element nulls the result, as the HOF's
  * null-propagating lambda does). No overflow for the uses here:
  * acc < p <= ~9e15, |mult| <= 131, |v| < 2^32 → |acc*mult + v| < 2^63.
  */
case class PolyFoldExpr(left: Expression, right: Expression, mult: Long, p: Long)
    extends BinaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType), LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_polyfold"

  override protected def nullSafeEval(arrIn: Any, seedIn: Any): Any = {
    val arr = arrIn.asInstanceOf[ArrayData]
    val nEl = arr.numElements()
    var acc = seedIn.asInstanceOf[Long]
    var i = 0
    while (i < nEl) {
      if (arr.isNullAt(i)) return null
      acc = java.lang.Math.floorMod(acc * mult + arr.getLong(i), p)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, seed) => {
      val nEl = ctx.freshName("nEl")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $nEl = $arr.numElements();
         |long $acc = $seed;
         |for (int $i = 0; $i < $nEl; $i++) {
         |  if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc = java.lang.Math.floorMod($acc * ${mult}L + $arr.getLong($i), ${p}L);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolyFoldExpr =
    copy(left = newLeft, right = newRight)
}

object PolyFoldExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PolyFoldExpr].getName, "graft_polyfold")
}

/** Static helpers callable from generated Java. */
object TextExprHelpers {

  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // word start offsets: 0 and every byte after a 0x20
    var numWords = 1
    var i = 0
    while (i < len) { if (bytes(i) == 0x20) numWords += 1; i += 1 }
    if (numWords < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](numWords + 1) // starts(numWords) = len + 1 sentinel
    var w = 1
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = len + 1
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j <= numWords - n) {
      val from = starts(j)
      val until = starts(j + n) - 1 // end of word j+n-1 (drop the separator)
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      j += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
