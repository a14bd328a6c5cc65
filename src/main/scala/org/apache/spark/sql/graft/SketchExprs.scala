package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expressions for the sketch hot paths: the higher-order
  * `aggregate`/`transform` forms in graft.operators.Text interpret a lambda
  * per (token x bit) / (token x permutation), which measured tens of CPU-
  * seconds per corpus pass; these run the same arithmetic as tight loops
  * inside whole-stage codegen. Semantics are bit-identical to the HOF forms
  * on non-null, non-empty inputs — asserted by the spec suite — so DuckDB
  * oracles are unaffected.
  */

/** SimHash of a token-hash array (Charikar sign aggregation): bit b of the
  * result is set iff more tokens have bit b set than clear. Duplicate tokens
  * count every occurrence, matching the HOF form. Elements must be non-null.
  */
case class SimhashExpr(child: Expression, nBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Long](nBits)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < nBits) {
        counts(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < nBits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hs.numElements();
         |long[] $counts = new long[$nBits];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    $counts[$b] += ((($h >> $b) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimhashExpr].getName, "graft_simhash")
}

/** MinHash signature of a token-hash array: element i of the result is
  * min over tokens of (a_i * h + b_i) floorMod p — the classic Broder
  * permutation family. Matches the HOF form (which uses pmod) exactly for
  * ANY token hash sign — including the default murmur hash, whose low word
  * is negative for ~half of inputs — and the empty-input case (all-null
  * signature elements). Token hashes must be non-null and |a*h+b| must not
  * overflow: polyHash < 1e9+7 and murmur-int both keep a*h < 2^62.
  */
case class MinhashSigExpr(child: Expression, abs: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with ExpectsInputTypes {
  // abs is a Seq (not Array) so case-class equality — and with it plan
  // canonicalization / cache matching — compares contents, not references

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val as: Array[Long] = abs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = abs.map(_._2).toArray
  private def k = abs.length

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        // floorMod, not %: the HOF twin uses pmod, and the default murmur
        // token hash is a signed int (~half negative) — Java's signed %
        // would silently diverge from the documented bit-equality contract
        val v = java.lang.Math.floorMod(as(j) * h + bs(j), p)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
      val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = java.lang.Math.floorMod($aRef[$j] * $h + $bRef[$j], ${p}L);
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
}

object MinhashSigExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinhashSigExpr].getName, "graft_minhash_sig")
}

/** All `nTables` sign-LSH bucket keys of a float-vector in ONE pass:
  * element t of the result is the bucket for hash table t —
  * `(t << 32) | bits`, bit p set iff `dot(vec, plane(t, p)) >= 0` with the
  * same sequential-double accumulation as `DotProductFloat` (so a DuckDB
  * oracle embedding the same integer plane constants reproduces every
  * bucket bit-identically). `planes` is the [table][plane][dim]-flattened
  * component matrix.
  *
  * Exists because the built-ins form (nTables x nPlanes `dot` calls over
  * 64-literal arrays, ORed and exploded) bloats the plan to thousands of
  * nodes — Catalyst re-optimization per action cost more than the sketch
  * itself, and the generator expression fell out of codegen. This is the
  * same arithmetic as one tight loop over a reference-object matrix; the
  * spec suite asserts bit-equality against the Column twin
  * (`Similarity.multiTableBucketsHof`).
  */
case class LshBucketsExpr(child: Expression, planes: Seq[Float],
                          nPlanes: Int, nTables: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nPlanes >= 1 && nPlanes < 32, s"nPlanes must be in [1, 31], got $nPlanes")
  require(planes.length == nTables * nPlanes * dim,
    s"planes length ${planes.length} != $nTables*$nPlanes*$dim")
  // planes is a Seq (not Array) so case-class equality — and plan
  // canonicalization / cache matching — compares contents, not references

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  @transient private lazy val pl: Array[Float] = planes.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bits = t.toLong << 32
      var p = 0
      while (p < nPlanes) {
        val off = (t * nPlanes + p) * dim
        var s = 0.0
        var i = 0
        while (i < n) {
          s += vec.getFloat(i).toDouble * pl(off + i).toDouble
          i += 1
        }
        if (s >= 0) bits |= (1L << p)
        p += 1
      }
      out(t) = bits
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val plRef = ctx.addReferenceObj("lshPlanes", pl, "float[]")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val bits = ctx.freshName("bits")
      val out = ctx.freshName("out")
      s"""
         |int $n = java.lang.Math.min($vec.numElements(), $dim);
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bits = ((long) $t) << 32;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    int $off = ($t * $nPlanes + $p) * $dim;
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += ((double) $vec.getFloat($i)) * ((double) $plRef[$off + $i]);
         |    }
         |    if ($s >= 0) $bits |= (1L << $p);
         |  }
         |  $out[$t] = $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

object LshBucketsExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[LshBucketsExpr].getName, "graft_lsh_buckets")
}

/** Nearest-centroid cell of a float-vector — the IVF coarse-quantizer
  * assignment — in ONE pass: argmin over `nCells` centers of
  * `||v||² - 2·(v·c) + ||c||²`, every dot the same sequential-double
  * accumulation as `DotProductFloat` and the combination evaluated
  * `(vv - (2.0*vc)) + cc`, so a DuckDB oracle replaying the distance with
  * inline folds over the SAME center literals reproduces every assignment
  * bit-identically (ties keep the LOWEST cell — the scan keeps the first
  * strict minimum, matching `min(struct(dist, cell))` and
  * `ORDER BY dist, cell LIMIT 1`). `centers` is the [cell][dim]-flattened
  * matrix in cell order; per-cell ||c||² is precomputed once, not per row.
  *
  * Exists because the relational form — corpus x centers broadcast join +
  * min_by aggregate — materializes n·nCells wide rows for what is a tight
  * per-row loop: at 300k vectors x 548 cells that is 164M rows of pure
  * plan overhead (measured ~30 s vs ~1 s here). The join form is kept as
  * the bit-equality twin (`Similarity.ivfAssignHof`), asserted in the spec
  * suite.
  */
case class IvfArgminExpr(child: Expression, centers: Seq[Float],
                         nCells: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nCells >= 1, s"nCells must be >= 1, got $nCells")
  require(centers.length == nCells * dim,
    s"centers length ${centers.length} != $nCells*$dim")
  // centers is a Seq (not Array) so case-class equality — and plan
  // canonicalization / cache matching — compares contents, not references

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_ivf_argmin"

  @transient private lazy val ctr: Array[Float] = centers.toArray
  @transient private lazy val cc: Array[Double] = {
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val v = ctr(c * dim + i).toDouble
        s += v * v
        i += 1
      }
      out(c) = s
      c += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    var vv = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      vv += x * x
      i += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var s = 0.0
      i = 0
      while (i < n) {
        s += vec.getFloat(i).toDouble * ctr(off + i).toDouble
        i += 1
      }
      val d = vv - 2.0 * s + cc(c)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val ctrRef = ctx.addReferenceObj("ivfCenters", ctr, "float[]")
      val ccRef = ctx.addReferenceObj("ivfCc", cc, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val vv = ctx.freshName("vv")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = java.lang.Math.min($vec.numElements(), $dim);
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $vec.getFloat($i);
         |  $vv += $x * $x;
         |}
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $nCells; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $vec.getFloat($i)) * ((double) $ctrRef[$off + $i]);
         |  }
         |  double $d = $vv - 2.0 * $s + $ccRef[$c];
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfArgminExpr =
    copy(child = newChild)
}

object IvfArgminExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IvfArgminExpr].getName, "graft_ivf_argmin")
}

/** The `p` NEAREST quantizer cells of a float-vector, ordered by
  * (distance asc, cell asc) — the probe-selection generalization of
  * [[IvfArgminExpr]] (element 0 IS the argmin; same distance arithmetic,
  * same first-strict-minimum tie rule per selection step, so the array
  * order matches `row_number() OVER (ORDER BY dist, cell)` exactly and
  * oracle replays reproduce every probe set).
  *
  * Exists because relational probe selection (vector × centers join +
  * rank window) materializes n·nCells rows through an exchange before
  * the WindowGroupLimit cuts them: harmless for a broadcast-small ANN
  * query batch, QUADRATIC for corpus-side probing under `pairCells`
  * sizing (cells ∝ n — the r11 xlang lane's Explain audit caught
  * n²/44 intermediate rows) and n^1.5 for the self-kNN join under
  * `autoCells`. Here the same selection is a per-row loop: nCells·dim
  * distance work (unavoidable for a flat quantizer) + p·nCells selection,
  * emitting exactly p ints per row. The relational form stays as the
  * bit-equality twin (`Similarity.probeCellPlan`), spec-asserted.
  */
case class IvfTopCellsExpr(child: Expression, centers: Seq[Float],
                           nCells: Int, dim: Int, p: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nCells >= 1, s"nCells must be >= 1, got $nCells")
  require(p >= 1 && p <= nCells, s"p must be in [1, $nCells], got $p")
  require(centers.length == nCells * dim,
    s"centers length ${centers.length} != $nCells*$dim")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_ivf_top_cells"

  @transient private lazy val ctr: Array[Float] = centers.toArray
  @transient private lazy val cc: Array[Double] = {
    val out = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val v = ctr(c * dim + i).toDouble
        s += v * v
        i += 1
      }
      out(c) = s
      c += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    var vv = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      vv += x * x
      i += 1
    }
    val dist = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      val off = c * dim
      var s = 0.0
      i = 0
      while (i < n) {
        s += vec.getFloat(i).toDouble * ctr(off + i).toDouble
        i += 1
      }
      dist(c) = vv - 2.0 * s + cc(c)
      c += 1
    }
    val taken = new Array[Boolean](nCells)
    val out = new Array[Int](p)
    var k = 0
    while (k < p) {
      var best = -1
      var bestD = Double.PositiveInfinity
      c = 0
      while (c < nCells) {
        if (!taken(c) && dist(c) < bestD) { bestD = dist(c); best = c }
        c += 1
      }
      // NaN-poisoned vector: every comparison is false and best stays -1.
      // Degrade to the lowest un-taken cell (IvfArgminExpr's best-=-0
      // discipline) instead of throwing on taken(-1).
      if (best < 0) { best = 0; while (taken(best)) best += 1 }
      taken(best) = true
      out(k) = best
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val ctrRef = ctx.addReferenceObj("ivfCenters", ctr, "float[]")
      val ccRef = ctx.addReferenceObj("ivfCc", cc, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val vv = ctx.freshName("vv")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val dist = ctx.freshName("dist")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = java.lang.Math.min($vec.numElements(), $dim);
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $vec.getFloat($i);
         |  $vv += $x * $x;
         |}
         |double[] $dist = new double[$nCells];
         |for (int $c = 0; $c < $nCells; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $vec.getFloat($i)) * ((double) $ctrRef[$off + $i]);
         |  }
         |  $dist[$c] = $vv - 2.0 * $s + $ccRef[$c];
         |}
         |boolean[] $taken = new boolean[$nCells];
         |int[] $out = new int[$p];
         |for (int $k = 0; $k < $p; $k++) {
         |  int $best = -1;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    if (!$taken[$c] && $dist[$c] < $bestD) { $bestD = $dist[$c]; $best = $c; }
         |  }
         |  if ($best < 0) { $best = 0; while ($taken[$best]) $best++; }
         |  $taken[$best] = true;
         |  $out[$k] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfTopCellsExpr =
    copy(child = newChild)
}

object IvfTopCellsExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IvfTopCellsExpr].getName, "graft_ivf_top_cells")
}

/** TWO-LEVEL nearest-centroid assignment — the quantizer shape past the
  * flat argmin's comfortable cell count: argmin over `nCoarse` coarse
  * centers, then argmin over that winner's `nFine` sub-centers; the
  * returned cell id is `coarse * nFine + fine`. Per-row work is
  * (nCoarse + nFine)·dim instead of (nCoarse·nFine)·dim — at 65k cells
  * (256 x 256) that is ~256x less — which is what keeps √n cells viable
  * at 10^9+ vectors. The assignment is hierarchical-greedy, the standard
  * IMI/two-level-IVF trade: the globally nearest fine cell can hide under
  * a runner-up coarse cell, so recall is bought back with `nProbe` at
  * search time (measured in the spec suite).
  *
  * Distances drop the ||v||² term (constant per row — argmin-invariant);
  * ties keep the lowest index at both levels. Bit-equality twin:
  * `Similarity.ivfAssign2Hof` (same cc - 2·vc arithmetic relationally).
  * `coarse` is [nCoarse][dim]-flattened, `fine` [nCoarse][nFine][dim].
  */
case class IvfArgmin2Expr(child: Expression, coarse: Seq[Float], fine: Seq[Float],
                          nCoarse: Int, nFine: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nCoarse >= 1 && nFine >= 1, s"bad cell counts ($nCoarse, $nFine)")
  require(coarse.length == nCoarse * dim,
    s"coarse length ${coarse.length} != $nCoarse*$dim")
  require(fine.length == nCoarse * nFine * dim,
    s"fine length ${fine.length} != $nCoarse*$nFine*$dim")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_ivf_argmin2"

  @transient private lazy val co: Array[Float] = coarse.toArray
  @transient private lazy val fi: Array[Float] = fine.toArray
  private def sqNorms(ctr: Array[Float], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var c = 0
    while (c < n) {
      var s = 0.0
      var i = 0
      while (i < dim) { val v = ctr(c * dim + i).toDouble; s += v * v; i += 1 }
      out(c) = s
      c += 1
    }
    out
  }
  @transient private lazy val coCc: Array[Double] = sqNorms(co, nCoarse)
  @transient private lazy val fiCc: Array[Double] = sqNorms(fi, nCoarse * nFine)

  private def argmin(vec: ArrayData, n: Int, ctr: Array[Float],
                     cc: Array[Double], base: Int, count: Int): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < count) {
      val off = (base + c) * dim
      var s = 0.0
      var i = 0
      while (i < n) { s += vec.getFloat(i).toDouble * ctr(off + i).toDouble; i += 1 }
      val d = cc(base + c) - 2.0 * s
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val c = argmin(vec, n, co, coCc, 0, nCoarse)
    val f = argmin(vec, n, fi, fiCc, c * nFine, nFine)
    c * nFine + f
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val coRef = ctx.addReferenceObj("ivf2Co", co, "float[]")
      val fiRef = ctx.addReferenceObj("ivf2Fi", fi, "float[]")
      val coCcRef = ctx.addReferenceObj("ivf2CoCc", coCc, "double[]")
      val fiCcRef = ctx.addReferenceObj("ivf2FiCc", fiCc, "double[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val bestC = ctx.freshName("bestC")
      val bestF = ctx.freshName("bestF")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = java.lang.Math.min($vec.numElements(), $dim);
         |int $bestC = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $nCoarse; $c++) {
         |  int $off = $c * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $vec.getFloat($i)) * ((double) $coRef[$off + $i]);
         |  }
         |  double $d = $coCcRef[$c] - 2.0 * $s;
         |  if ($d < $bestD) { $bestD = $d; $bestC = $c; }
         |}
         |int $bestF = 0;
         |$bestD = Double.POSITIVE_INFINITY;
         |for (int $c = 0; $c < $nFine; $c++) {
         |  int $off = ($bestC * $nFine + $c) * $dim;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $vec.getFloat($i)) * ((double) $fiRef[$off + $i]);
         |  }
         |  double $d = $fiCcRef[$bestC * $nFine + $c] - 2.0 * $s;
         |  if ($d < $bestD) { $bestD = $d; $bestF = $c; }
         |}
         |${ev.value} = $bestC * $nFine + $bestF;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): IvfArgmin2Expr =
    copy(child = newChild)
}

object IvfArgmin2Expr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[IvfArgmin2Expr].getName, "graft_ivf_argmin2")
}

/** HLL observable in ONE codegen pass: avalanche-mix the (nonnegative,
  * < 2^32-product-safe) poly hash, then pack `bucket · 32 + rho` into a
  * single long — bucket = mixed mod 2^p, rho = trailing zeros of
  * (mixed div 2^p) + 1, capped at `rhoCap` for the w = 0 case.
  *
  * Exists because the Column-built mix chain (kept as
  * `Sketch.hllMixTwin` for bit-equality specs) gets RE-EVALUATED by the
  * aggregate when it feeds the grouping key — measured 1.80 s vs the
  * 0.65 s cheap-key baseline for the same groupBy at 10M rows; with the
  * pack projected once, bucket/rho derive from a plain column. Mirrors
  * `Sketch`'s DuckDB oracle arithmetic exactly (sub-2^30 multiplies mod
  * 2^32 — DuckDB raises on BIGINT overflow; >> on values < 2^32 equals
  * the oracle's integer division).
  */
case class HllPackExpr(child: Expression, p: Int, rhoCap: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(p >= 1 && p <= 26, s"p must be in [1, 26], got $p")
  require(rhoCap >= 1 && rhoCap <= 31, s"rhoCap must be in [1, 31], got $rhoCap")

  override def nullIntolerant: Boolean = true

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_pack"

  override protected def nullSafeEval(input: Any): Any = {
    val h0 = input.asInstanceOf[Long]
    var x = (h0 * 668265261L) % 4294967296L
    x ^= (x >> 15)
    x = (x * 374761393L) % 4294967296L
    x ^= (x >> 13)
    val m = 1L << p
    val w = x / m
    val rho = if (w == 0L) rhoCap.toLong
              else java.lang.Long.numberOfTrailingZeros(w) + 1L
    (x % m) * 32L + rho
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h0 => {
      val x = ctx.freshName("x")
      val w = ctx.freshName("w")
      val rho = ctx.freshName("rho")
      s"""
         |long $x = ($h0 * 668265261L) % 4294967296L;
         |$x ^= ($x >> 15);
         |$x = ($x * 374761393L) % 4294967296L;
         |$x ^= ($x >> 13);
         |long $w = $x / ${1L << p}L;
         |long $rho = ($w == 0L) ? ${rhoCap}L
         |            : (long) java.lang.Long.numberOfTrailingZeros($w) + 1L;
         |${ev.value} = ($x % ${1L << p}L) * 32L + $rho;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HllPackExpr =
    copy(child = newChild)
}

object HllPackExpr {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[HllPackExpr].getName, "graft_hll_pack")
}
