package graft

import org.apache.spark.sql.{ExtensionsProbe, SparkSessionExtensions}
import org.scalatest.funsuite.AnyFunSuite

/** Unit check of the extension injection; the real `--conf
  * spark.sql.extensions=graft.GraftExtensions` path is exercised end-to-end
  * by the verify drive (spark-shell with the conf set). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions inject the full graft function surface into the registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val fns = ExtensionsProbe.registeredFunctions(ext)
    Seq("graft_cosine", "graft_dot", "graft_shingles", "graft_shingle_hashes",
      "graft_shingle_hashes64", "graft_minhash_sig", "graft_simhash",
      "graft_simhash64", "graft_normalize_text", "graft_jaro_winkler",
      "graft_damerau_levenshtein",
      "graft_topk_agg", "graft_minhash_agg")
      .foreach(f => assert(fns.contains(f), s"missing $f"))
  }
}
