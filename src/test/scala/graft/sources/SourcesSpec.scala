package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv source with explicit DDL schema") {
    val dir = tmpDir("csv")
    Files.writeString(Paths.get(dir, "emp.csv"),
      "7369,smith,800.0,20,300\n5468,scott,2850.0,10,\n")
    val df = Sources.csv(spark, dir + "/emp.csv",
      "empid int, ename string, sal double, deptno int, comm int")
    assert(df.count() == 2)
    assert(df.filter($"empid" === 5468).collect().head.isNullAt(4))
  }

  test("parquet source honors the read cap") {
    val dir = tmpDir("pq")
    (1 to 10).toDF("x").write.mode("overwrite").parquet(dir)
    assert(Sources.parquet(spark, dir).count() == 10)
    assert(Sources.parquet(spark, dir, readLimit = 3).count() == 3)
  }

  test("paginated HTTP JSON source follows links.next and unions pages") {
    val pages = Map(
      "page1" ->
        """{"data":[{"id":1,"attributes":{"email":"a@x.com","name":"a"}},
          |         {"id":2,"attributes":{"email":"b@x.com","name":"b"}}],
          | "links":{"next":"page2"}}""".stripMargin,
      "page2" ->
        """{"data":[{"id":3,"attributes":{"email":"c@x.com","name":"c"}}],
          | "links":{"next":null}}""".stripMargin)
    val df = Sources.httpJson(spark, "page1", pages(_))
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("id", "email", "name"))
    assert(df.select("email").as[String].collect().toSet ==
      Set("a@x.com", "b@x.com", "c@x.com"))
  }

  test("http source terminates cleanly when the last page has no links.next") {
    val pages = Map(
      "p1" -> """{"data":[{"id":1,"attributes":{"v":1}}],"links":{"next":"p2"}}""",
      "p2" -> """{"data":[{"id":2,"attributes":{"v":2}}],"links":{}}""")
    val df = Sources.httpJson(spark, "p1", pages(_))
    assert(df.count() == 2)
  }

  test("http source stops at maxPages") {
    var calls = 0
    val fetch = (_: String) => {
      calls += 1
      """{"data":[{"id":1,"attributes":{"v":1}}],"links":{"next":"again"}}"""
    }
    Sources.httpJson(spark, "start", fetch, maxPages = 3)
    assert(calls == 3)
  }
}
