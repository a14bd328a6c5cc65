package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.{DotProductFloat, LshBucketsExpr, MinhashSigExpr, PolyFoldExpr, PolyHashExpr, SimhashExpr, WordShinglesExpr}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * in the SQL function registry so `spark.sql("... graft_dot(a, b) ...")`
  * works cluster-wide. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Scalar-parameterized sketches take their shape arguments as FOLDABLE
  * integer literals (`graft_simhash(arr, 30)`, `graft_minhash_sig(arr, 64)`)
  * — the parameters pick code-generated loop bounds / permutation constants,
  * so they must be known at plan time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int,
                     lo: Int = 1, hi: Int = Int.MaxValue): Int = e match {
    case l: Literal if l.foldable && l.value != null =>
      val v = l.value.toString.toInt
      // range-check at registration: out-of-range shape args would
      // otherwise wrap silently in the generated code (1L << 64 == 1,
      // negative loop bounds skip the loop) instead of failing like the
      // ANSI-mode HOF equivalents
      if (v < lo || v > hi) throw new IllegalArgumentException(
        s"$fn: argument $pos must be in [$lo, $hi], got $v")
      v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a foldable integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
    // materialized-view rollup serving (no-op until MvRegistry has entries)
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.MvRewriteRule())
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      DotProductFloat.info,
      (children: Seq[Expression]) => DotProductFloat(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      PolyHashExpr.info,
      (children: Seq[Expression]) => PolyHashExpr(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      SimhashExpr.info,
      (children: Seq[Expression]) =>
        // 63 max: bit 63 would make `1L << b` the sign bit
        SimhashExpr(children(0), intArg(children(1), "graft_simhash", 2, 1, 63))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      WordShinglesExpr.info,
      (children: Seq[Expression]) =>
        WordShinglesExpr(children(0), intArg(children(1), "graft_shingles", 2))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyfold"),
      PolyFoldExpr.info,
      (children: Seq[Expression]) => {
        // seed must stay below the modulus: the native fold reduces mod p
        // AFTER the first multiply, so a seed >= p could overflow acc*131
        // silently where the ANSI-mode HOF equivalent would raise
        children(1) match {
          case l: Literal if l.foldable && l.value != null =>
            val s = l.value.toString.toLong
            if (s < 0 || s >= graft.operators.Text.BandP)
              throw new IllegalArgumentException(
                s"graft_polyfold: seed must be in [0, ${graft.operators.Text.BandP}), got $s")
          case _ => // non-literal seed: precondition documented on PolyFoldExpr
        }
        PolyFoldExpr(children(0), children(1), 131L, graft.operators.Text.BandP)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      MinhashSigExpr.info,
      (children: Seq[Expression]) => {
        val k = intArg(children(1), "graft_minhash_sig", 2, 1, 4096)
        MinhashSigExpr(children(0), graft.operators.Text.minhashPermConsts(k),
          graft.operators.Text.MinhashP)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_buckets"),
      LshBucketsExpr.info,
      (children: Seq[Expression]) => {
        // graft_lsh_buckets(vec, nPlanes, nTables, dim) — planes derived
        // from the deterministic cross-engine constants
        val nPlanes = intArg(children(1), "graft_lsh_buckets", 2, 1, 31)
        val nTables = intArg(children(2), "graft_lsh_buckets", 3, 1, 256)
        val dim = intArg(children(3), "graft_lsh_buckets", 4, 1, 1 << 16)
        val planes: Seq[Float] = for {
          t <- 0 until nTables; p <- 0 until nPlanes
          c <- graft.operators.Similarity.lshPlaneConsts(t, p, dim)
        } yield c.toFloat
        LshBucketsExpr(children(0), planes, nPlanes, nTables, dim)
      }))
  }
}
