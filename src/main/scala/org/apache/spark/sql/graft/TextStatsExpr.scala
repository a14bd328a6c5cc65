package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row n-gram repetition statistics in ONE codegen pass: given a
  * document's gram array (duplicates included, any order), returns
  * `struct<n_grams, n_distinct_grams, top_gram_n, dup_n>` — total
  * occurrences, distinct grams, the modal gram's count, and the number of
  * occurrences belonging to grams seen >= 2 times.
  *
  * This is the SHUFFLE-FREE twin of the relational rollup in
  * `Text.repetitionSignals` (explode → groupBy (id, gram) → per-id
  * rollup): because every statistic is local to one document, the whole
  * computation is a per-row hash count — embarrassingly parallel, zero
  * exchanges, linear in corpus token count, and the output never leaves
  * the scan stage. Bit-identical to both the relational form and the
  * sorted-fold HOF twin (`Text.repetitionStatsHof`), spec-asserted.
  * Grams hash as exact STRINGS (UTF8String map keys) — no hash-collision
  * under-count, same exactness argument as dedupSpans' span keys.
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("top_gram_n", LongType, nullable = false),
    StructField("dup_n", LongType, nullable = false)))
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = org.apache.spark.sql.graft.RepetitionStatsExpr.compute($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStatsExpr = copy(child = newChild)
}

object RepetitionStatsExpr {
  /** Shared by eval and codegen: one hash-count pass over the gram array.
    * Grams must be non-null strings.
    */
  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Array[Long]](Math.max(16, n))
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i)
      val c = counts.get(g)
      if (c == null) counts.put(g.clone(), Array(1L)) else c(0) += 1L
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > top) top = c
      if (c >= 2L) dup += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, counts.size().toLong, top, dup))
  }
}
