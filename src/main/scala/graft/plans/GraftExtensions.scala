package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.{DotProductFloat, MinhashSigExpr, PolyFoldExpr, PolyHashExpr, SimhashExpr, WordShinglesExpr}

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

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case l: Literal if l.foldable && l.value != null =>
      l.value.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a foldable integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.AsOfJoinStrategy)
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
        SimhashExpr(children(0), intArg(children(1), "graft_simhash", 2))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      WordShinglesExpr.info,
      (children: Seq[Expression]) =>
        WordShinglesExpr(children(0), intArg(children(1), "graft_shingles", 2))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyfold"),
      PolyFoldExpr.info,
      (children: Seq[Expression]) =>
        PolyFoldExpr(children(0), children(1), 131L, graft.operators.Text.BandP)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      MinhashSigExpr.info,
      (children: Seq[Expression]) => {
        val k = intArg(children(1), "graft_minhash_sig", 2)
        MinhashSigExpr(children(0), graft.operators.Text.minhashPermConsts(k),
          graft.operators.Text.MinhashP)
      }))
  }
}
