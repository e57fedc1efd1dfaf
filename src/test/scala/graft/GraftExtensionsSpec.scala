package graft

import org.apache.spark.sql.{ExtensionsProbe, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** Unit check of the extension injection; the real `--conf
  * spark.sql.extensions=graft.GraftExtensions` path is exercised end-to-end
  * by the verify drive (spark-shell with the conf set). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject graft_cosine/graft_dot into the function registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val fns = ExtensionsProbe.registeredFunctions(ext)
    assert(fns.contains("graft_cosine"))
    assert(fns.contains("graft_dot"))
  }
}
