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

  test("http source appends each page to CSV as it paginates") {
    val pages = Map(
      "p1" -> """{"data":[{"id":1,"attributes":{"v":"a"}}],"links":{"next":"p2"}}""",
      "p2" -> """{"data":[{"id":2,"attributes":{"v":"b"}},{"id":3,"attributes":{"v":"c"}}],"links":{"next":"p3"}}""",
      "p3" -> """{"data":[{"id":4,"attributes":{"v":"d"}}],"links":{}}""")
    val dir = tmpDir("httpcsv")
    var appends = 0
    val counted: org.apache.spark.sql.DataFrame => Unit = { df =>
      appends += 1
      val before = appends // rows on disk BEFORE this append completes
      Sources.csvPageSink(dir)(df)
      // one append per page, each visible on disk before the next fetch
      val onDisk = spark.read.schema("id long, v string").csv(dir).count()
      assert(onDisk == Seq("p1", "p2", "p3").take(before).map(pages(_)).map(
        p => "\"id\"".r.findAllIn(p).length).sum, s"page $before not spilled")
    }
    val df = Sources.httpJson(spark, "p1", pages(_), pageSink = counted)
    assert(appends == 3)
    assert(df.count() == 4)
    val spilled = spark.read.schema("id long, v string").csv(dir)
    assert(spilled.count() == 4)
    assert(spilled.select("v").as[String].collect().toSet == Set("a", "b", "c", "d"))
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
