package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct}

/** Spark-native extension point: injects the engine's Catalyst expressions
  * into every session built with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), making `graft_cosine` /
  * `graft_dot` first-class SQL functions cluster-wide — no per-session
  * registration call needed. Runtime registration for an existing session
  * remains available via [[graft.functions.VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      exprs => build(exprs))

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_cosine", es => CosineSimilarity(es(0), es(1))))
    ext.injectFunction(fn("graft_dot", es => DotProduct(es(0), es(1))))
  }
}
