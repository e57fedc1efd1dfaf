package graft.merge

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec
import MergeInto._

/** Row type for the property model (top-level: Spark can't encode case
  * classes nested inside a test class). */
case class MergePropRow(k: Int, a: Int, b: String)

/** Property-based check: MergeInto against an executable row-by-row model of
  * SQL MERGE semantics, over random targets, updates and clause matrices. */
class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private type R = MergePropRow
  private val R = MergePropRow

  // (sql condition over target./updates., model evaluation)
  private val conditions: Seq[(String, (R, R) => Boolean)] = Seq(
    ("updates.a % 2 = 0", (_, u) => u.a % 2 == 0),
    ("target.a > 5", (t, _) => t.a > 5),
    ("updates.a > target.a", (t, u) => u.a > t.a),
    ("updates.b <> target.b", (t, u) => u.b != t.b),
    ("updates.b = 'x' AND target.a < 8", (t, u) => u.b == "x" && t.a < 8),
    ("target.a + updates.a > 10", (t, u) => t.a + u.a > 10))

  private sealed trait MClause { def cond: Option[Int] }
  private case class MDelete(cond: Option[Int]) extends MClause
  private case class MUpdateAll(cond: Option[Int]) extends MClause
  private case class MUpdateExpr(cond: Option[Int]) extends MClause // a := updates.a + 100
  private case class NClause(cond: Option[Int], insertAll: Boolean)

  private val genCond = Gen.option(Gen.choose(0, conditions.size - 1))
  private val genMClause: Gen[MClause] = Gen.oneOf(
    genCond.map(MDelete(_)), genCond.map(MUpdateAll(_)), genCond.map(MUpdateExpr(_)))
  private val genNClause: Gen[NClause] =
    Gen.zip(genCond, Gen.oneOf(true, false)).map { case (c, i) => NClause(c, i) }

  private val genRow: Gen[R] = for {
    k <- Gen.choose(0, 10)
    a <- Gen.choose(0, 9)
    b <- Gen.oneOf("x", "y", "z")
  } yield R(k, a, b)

  // Variable-length clause matrices: 0..3 matched and 0..2 not-matched
  // clauses exercise first-satisfied-wins ordering, the no-clause
  // degenerate (merge keeps target / drops updates), and shadowed
  // clauses (an unconditional clause ahead of a conditional one).
  private val genScenario = for {
    target <- Gen.listOfN(8, genRow)
    updatesRaw <- Gen.listOfN(8, genRow)
    nm <- Gen.choose(0, 3)
    nn <- Gen.choose(0, 2)
    matched <- Gen.listOfN(nm, genMClause)
    notMatched <- Gen.listOfN(nn, genNClause)
  } yield (target, updatesRaw.groupBy(_.k).values.map(_.head).toList, matched, notMatched)

  private def holds(c: Option[Int], t: R, u: R): Boolean =
    c.forall(i => conditions(i)._2(t, u))

  /** Row-by-row reference model of MERGE. */
  private def model(target: List[R], updates: List[R],
                    matched: List[MClause], notMatched: List[NClause]): List[R] = {
    val byKey = updates.map(u => u.k -> u).toMap
    val kept = target.flatMap { t =>
      byKey.get(t.k) match {
        case None => Some(t)
        case Some(u) =>
          matched.find(c => holds(c.cond, t, u)) match {
            case Some(MDelete(_)) => None
            case Some(MUpdateAll(_)) => Some(u)
            case Some(MUpdateExpr(_)) => Some(t.copy(a = u.a + 100))
            case None => Some(t)
          }
      }
    }
    val targetKeys = target.map(_.k).toSet
    val inserted = updates.filterNot(u => targetKeys.contains(u.k)).flatMap { u =>
      notMatched.find(c => c.cond.forall(i => conditions(i)._2(u, u))) match {
        case Some(NClause(_, true)) => Some(u)
        case Some(NClause(_, false)) => Some(R(u.k, -1, u.b)) // insertExpr: a := -1
        case None => None
      }
    }
    kept ++ inserted
  }

  private def toAdt(matched: List[MClause], notMatched: List[NClause])
      : (Seq[WhenMatched], Seq[WhenNotMatched]) = {
    val m = matched.map {
      case MDelete(c) => WhenMatched(c.map(conditions(_)._1), Delete)
      case MUpdateAll(c) => WhenMatched(c.map(conditions(_)._1), UpdateAll)
      case MUpdateExpr(c) => WhenMatched(c.map(conditions(_)._1),
        UpdateExpr(Map("a" -> "updates.a + 100")))
    }
    // not-matched conditions see only the update row: reuse target-free ones
    // by aliasing (conditions referencing target.* are evaluated with t=u in
    // the model, so rewrite target.->updates. for the SQL side)
    val nm = notMatched.map { case NClause(c, insertAll) =>
      val sql = c.map(i => conditions(i)._1.replace("target.", "updates."))
      if (insertAll) WhenNotMatched(sql, InsertAll)
      else WhenNotMatched(sql, InsertExpr(Map(
        "k" -> "updates.k", "a" -> "-1", "b" -> "updates.b")))
    }
    (m, nm)
  }

  test("MergeInto matches the row-by-row MERGE model on random scenarios") {
    val prop = Prop.forAll(genScenario) { case (target, updates, matched, notMatched) =>
      val (m, nm) = toAdt(matched, notMatched)
      val got = MergeInto(target.toDF(), updates.toDF(), "target.k = updates.k", m, nm)
        .collect().map(r => R(r.getInt(0), r.getInt(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = model(target, updates, matched, notMatched)
        .groupBy(identity).view.mapValues(_.length).toMap
      if (got != want) {
        println(s"target=$target\nupdates=$updates\nmatched=$matched notMatched=$notMatched")
        println(s"got=$got\nwant=$want")
      }
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }
}
