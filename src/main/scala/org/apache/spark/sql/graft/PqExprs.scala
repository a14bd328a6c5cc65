package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Residual product quantization (PQ) for IVF cells — the 10^9-vector
  * MEMORY story. After coarse assignment, the residual v - c(cell) is
  * split into `m` subspaces of `dim / m` components; each subspace is
  * vector-quantized against its own `ks`-entry codebook (trained on
  * residual sub-vectors — `Similarity.pqTrain`). A 64-float vector
  * (256 B) compresses to m codes; with m <= 8 and ks <= 256 the whole
  * code word PACKS INTO ONE BIGINT (code for subspace i in byte i,
  * little-endian) — a 32x smaller in-cell payload, which is what lets a
  * probed cell live in executor memory at corpus scale.
  *
  * Search ranks candidates by ADC (asymmetric distance): the query keeps
  * its exact residual per probed cell; the candidate contributes only its
  * codes, and dist ≈ Σ_m ||qr_sub(m) - codebook[m][code_m]||². Both
  * expressions accumulate sequentially in double with identical operation
  * order — ((v - coarse) - cb), squared, summed ascending — so the
  * computation is engine-reproducible the same way DotProductFloat is.
  *
  * Reference capability class: skypies/flightdb has no ANN at all; this
  * extends the training-data-pipeline surface (SURVEY §2.44) the way IVF
  * itself does, following the published IVFADC design (Jégou et al.,
  * TPAMI 2011, public literature).
  *
  * Codebook layout (both exprs): flat [m][ks][dsub] float —
  * index (mm*ks + j)*dsub + d. Coarse layout: flat [nCells][dim].
  */

/** Encode (vector, cell) into the packed PQ code word: for each subspace,
  * the argmin over the codebook of the residual sub-vector distance, ties
  * to the LOWEST code (first strict minimum, like IvfArgminExpr).
  */
case class PqEncodeExpr(left: Expression, right: Expression,
                        coarse: Seq[Float], codebooks: Seq[Float],
                        nCells: Int, m: Int, ks: Int, dim: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(m >= 1 && m <= 8 && dim % m == 0,
    s"m=$m must be in 1..8 (one byte per code) and divide dim=$dim")
  require(ks >= 1 && ks <= 256, s"ks=$ks must fit one byte")
  require(coarse.length == nCells * dim,
    s"coarse length ${coarse.length} != $nCells*$dim")
  require(codebooks.length == m * ks * (dim / m),
    s"codebooks length ${codebooks.length} != $m*$ks*${dim / m}")

  private val dsub = dim / m

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val co: Array[Float] = coarse.toArray
  @transient private lazy val cb: Array[Float] = codebooks.toArray

  override protected def nullSafeEval(vecIn: Any, cellIn: Any): Any = {
    val vec = vecIn.asInstanceOf[ArrayData]
    val cell = cellIn.asInstanceOf[Int]
    var packed = 0L
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < ks) {
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val i = mm * dsub + d
          val t = (vec.getFloat(i).toDouble - co(cell * dim + i).toDouble) -
            cb((mm * ks + j) * dsub + d).toDouble
          s += t * t
          d += 1
        }
        if (s < bestD) { bestD = s; best = j }
        j += 1
      }
      packed |= best.toLong << (8 * mm)
      mm += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cell) => {
      val coRef = ctx.addReferenceObj("pqCoarse", co, "float[]")
      val cbRef = ctx.addReferenceObj("pqCb", cb, "float[]")
      val mm = ctx.freshName("mm"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val s = ctx.freshName("s")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val packed = ctx.freshName("packed")
      s"""
         |long $packed = 0L;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $ks; $j++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      int $i = $mm * $dsub + $d;
         |      double $t = (((double) $vec.getFloat($i)) - ((double) $coRef[$cell * $dim + $i]))
         |        - ((double) $cbRef[($mm * $ks + $j) * $dsub + $d]);
         |      $s += $t * $t;
         |    }
         |    if ($s < $bestD) { $bestD = $s; $best = $j; }
         |  }
         |  $packed |= ((long) $best) << (8 * $mm);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

object PqEncodeExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqEncodeExpr].getName, "graft_pq_encode")
}

/** ADC distance of a query against one packed code word in a probed cell:
  * Σ_m ||(q - coarse(cell))_sub(m) - codebook[m][code_m]||², sequential
  * double accumulation over subspaces then components.
  *
  * Per-row cost is m·dsub = dim multiplies — at dim 64 that matches an
  * exact distance, so the win HERE is purely the 32x smaller scan payload;
  * at production dims (1024+) a per-(query, cell) lookup table (computed
  * once, m·ks·dsub work amortized over the cell) is the standard next
  * step and slots in behind the same operator surface.
  */
case class PqAdcExpr(first: Expression, second: Expression, third: Expression,
                     coarse: Seq[Float], codebooks: Seq[Float],
                     nCells: Int, m: Int, ks: Int, dim: Int)
    extends TernaryExpression with ExpectsInputTypes {
  require(m >= 1 && m <= 8 && dim % m == 0,
    s"m=$m must be in 1..8 and divide dim=$dim")
  require(ks >= 1 && ks <= 256, s"ks=$ks must fit one byte")
  require(coarse.length == nCells * dim,
    s"coarse length ${coarse.length} != $nCells*$dim")
  require(codebooks.length == m * ks * (dim / m),
    s"codebooks length ${codebooks.length} != $m*$ks*${dim / m}")

  private val dsub = dim / m

  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType, LongType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  @transient private lazy val co: Array[Float] = coarse.toArray
  @transient private lazy val cb: Array[Float] = codebooks.toArray

  override protected def nullSafeEval(qIn: Any, cellIn: Any,
                                      codesIn: Any): Any = {
    val q = qIn.asInstanceOf[ArrayData]
    val cell = cellIn.asInstanceOf[Int]
    val codes = codesIn.asInstanceOf[Long]
    var s = 0.0
    var mm = 0
    while (mm < m) {
      val j = ((codes >>> (8 * mm)) & 0xFFL).toInt
      var d = 0
      while (d < dsub) {
        val i = mm * dsub + d
        val t = (q.getFloat(i).toDouble - co(cell * dim + i).toDouble) -
          cb((mm * ks + j) * dsub + d).toDouble
        s += t * t
        d += 1
      }
      mm += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, cell, codes) => {
      val coRef = ctx.addReferenceObj("pqAdcCoarse", co, "float[]")
      val cbRef = ctx.addReferenceObj("pqAdcCb", cb, "float[]")
      val mm = ctx.freshName("mm"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val t = ctx.freshName("t"); val s = ctx.freshName("s")
      s"""
         |double $s = 0.0;
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  int $j = (int) (($codes >>> (8 * $mm)) & 0xFFL);
         |  for (int $d = 0; $d < $dsub; $d++) {
         |    int $i = $mm * $dsub + $d;
         |    double $t = (((double) $q.getFloat($i)) - ((double) $coRef[$cell * $dim + $i]))
         |      - ((double) $cbRef[($mm * $ks + $j) * $dsub + $d]);
         |    $s += $t * $t;
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqAdcExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[PqAdcExpr].getName, "graft_pq_adc")
}
