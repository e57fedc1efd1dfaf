package graft.merge

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Sources
import MergeInto._

/** The reference's own SCD1 acceptance scenario, end-to-end through our CSV
  * source and table-backed writer (reference T/writter/DeltaWritterTest
  * .scala:71-100 over the classic EMP demo table): 5 employees; an update
  * batch that (a) changes a salary, (b) hits the `whenMatched(target.comm is
  * null).delete()` clause, and (c) inserts a new employee. Post-merge:
  * count stays 5, the salary is updated, the null-comm row is gone, the new
  * hire exists. */
class EmpScenarioSpec extends SparkSpec {
  import spark.implicits._

  private val empSchema = "empid int, ename string, sal double, deptno int, comm int"

  test("reference SCD1 scenario: update + conditional delete + insert") {
    val dir = tmpDir("emp")
    Files.writeString(Paths.get(dir, "emp.csv"),
      """5467,scott,247.0,10,100
        |5468,ward,1250.0,30,
        |7369,smith,800.0,20,300
        |7499,allen,1600.0,30,200
        |7521,king,5000.0,10,50
        |""".stripMargin)
    Files.writeString(Paths.get(dir, "emp_update.csv"),
      """5467,scott,500.0,10,100
        |5468,ward,1250.0,30,
        |5501,sriram,3000.0,20,150
        |""".stripMargin)

    val table = new ParquetTable(spark, s"$dir/table")
    Scd.writeScd1(table, Sources.csv(spark, s"$dir/emp.csv", empSchema), Seq("empid"))

    // pre-merge asserts (mirror of the reference's)
    assert(table.read.count() == 5)
    assert(table.read.filter($"empid" === 5467).select("sal").as[Double].head() == 247.0)
    assert(table.read.filter($"empid" === 5468).count() == 1)

    Scd.writeScd1(table, Sources.csv(spark, s"$dir/emp_update.csv", empSchema),
      Seq("empid"),
      matched = Seq(
        WhenMatched(Some("target.comm is null"), Delete),
        WhenMatched(None, UpdateAll)),
      notMatched = Seq(WhenNotMatched(None, InsertAll)))

    // post-merge asserts: count stays 5 (one delete + one insert)
    assert(table.read.count() == 5)
    assert(table.read.filter($"empid" === 5467).select("sal").as[Double].head() == 500.0)
    assert(table.read.filter($"empid" === 5468).count() == 0)   // deleted (comm null)
    assert(table.read.filter($"ename" === "sriram").count() == 1) // inserted
  }

  test("reference SCD2 scenario: place change expires the current row") {
    // shape of T/writter/DeltaWritterSCD2Test: composite keys, match on
    // current_flag + changed place, staged-union expiry
    val target = Seq(
      (1, 10, "delhi", true, "2024-01-01", null.asInstanceOf[String]),
      (2, 20, "mysore", true, "2024-01-01", null.asInstanceOf[String]),
      (2, 20, "bangalore", false, "2023-01-01", "2024-01-01") // expired old version
    ).toDF("empid", "deptno", "place", "currentFlag", "effDate", "expryDate")
    val updates = Seq(
      (1, 10, "pune", "2024-06-01"),   // changed -> expire + new
      (2, 20, "mysore", "2024-06-01")  // same place -> no-op
    ).toDF("empid", "deptno", "place", "effDate")

    val out = Scd.scd2Apply(target, updates, Seq("empid", "deptno"),
      matchCondition = "target.currentFlag = true AND target.place <> updates.place",
      updateMap = Map("currentFlag" -> "false", "expryDate" -> "updates.effDate"),
      insertMap = Map("empid" -> "updates.empid", "deptno" -> "updates.deptno",
        "place" -> "updates.place", "currentFlag" -> "true",
        "effDate" -> "updates.effDate", "expryDate" -> "cast(null as string)"))

    val rows = out.collect().map(r => (r.getInt(0), r.getString(2), r.getBoolean(3))).toSet
    assert(rows == Set(
      (1, "delhi", false),      // expired
      (1, "pune", true),        // new current version
      (2, "mysore", true),      // untouched current
      (2, "bangalore", false))) // untouched history
    // exactly one current row per key
    val currents = out.filter($"currentFlag").groupBy("empid").count()
      .select("count").as[Long].collect()
    assert(currents.forall(_ == 1))
  }
}
