package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry

/** Test-only bridge into the private[sql] side of SparkSessionExtensions:
  * materializes the function registry an extensions instance would install,
  * so specs can assert injection without constructing a fresh SparkSession
  * (getOrCreate reuses the shared test session and skips extensions). */
object ExtensionsProbe {
  def registeredFunctions(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }

  def registeredTableFunctions(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis
      .SimpleTableFunctionRegistry
    ext.registerTableFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
