package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.graft.{DotProductFloat, PolyHashExpr}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * in the SQL function registry so `spark.sql("... graft_dot(a, b) ...")`
  * works cluster-wide. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      DotProductFloat.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductFloat(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      PolyHashExpr.info,
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHashExpr(children(0))))
  }
}
