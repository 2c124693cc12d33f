package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native deployment entry point: register the engine's SQL
  * surface through `SparkSessionExtensions`, the supported extension
  * mechanism —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * so `SELECT cosine_distance(a, b)` works in any session of the
  * cluster without imperative registration. (`VectorFunctions
  * .registerAll` remains for driver-provided sessions the engine
  * doesn't construct, e.g. the judge harness.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // transparent exact-KNN → IVF-probe rewrite for tables registered
    // in graft.plans.IvfCatalog (explicit opt-in per table)
    ext.injectOptimizerRule(_ => graft.plans.IvfProbeRule)
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "_FUNC_(a, b) - double dot product of two float/double arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cosine_distance"),
      info("cosine_distance", "_FUNC_(a, b) - 1 - cos(a, b), NULL for zero vectors"),
      (es: Seq[Expression]) => CosineDistance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("l2_distance"),
      info("l2_distance", "_FUNC_(a, b) - Euclidean distance of two arrays"),
      (es: Seq[Expression]) => L2Distance(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("l2_norm"),
      info("l2_norm", "_FUNC_(a) - L2 norm of an array"),
      (es: Seq[Expression]) => L2Norm(es.head)))
    ext.injectFunction((FunctionIdentifier("l2_normalize"),
      info("l2_normalize", "_FUNC_(a) - a scaled to unit L2 norm, NULL for the zero vector"),
      (es: Seq[Expression]) => L2Normalize(es.head)))
  }
}
