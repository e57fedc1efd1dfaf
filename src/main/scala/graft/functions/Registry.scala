package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** Skip-if-present temp-function registration.
  *
  * `createOrReplaceTempFunction` logs a `SimpleFunctionRegistry` WARN
  * ("replaced a previously registered function") on every repeat call, and
  * the graft Column builders re-register on every use — hundreds of WARN
  * lines per test run burying real warnings. Registering only when the name
  * is absent is safe here because every `graft_*` name is semantically
  * addressed: either a fixed name with a fixed builder, or a name that
  * encodes exactly the content its builder closes over (broadcast id,
  * filter-bytes hash), so first-wins and last-wins are the same function. */
object Registry {
  def ensure(spark: SparkSession, name: String)
            (builder: Seq[Expression] => Expression): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name)))
      reg.createOrReplaceTempFunction(name, builder, "built-in")
  }
}
