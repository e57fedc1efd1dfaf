package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Corpus-level MinHash signature as a native Catalyst aggregate: per group,
  * the elementwise minimum of the affine mix family ([[Hashes.mixConstants]])
  * over every row's base hash. `minhash_agg(explode(shingle_hashes))`
  * produces the signature of the UNION of all member documents' shingle
  * sets — the building block for corpus-vs-corpus similarity (dataset
  * overlap estimation) at scale.
  *
  * A DeclarativeAggregate with `numHashes` flat LongType buffer slots: pure
  * expressions (no imperative buffer), fixed-width — eligible for
  * whole-stage-codegen HashAggregate with map-side partial aggregation, so
  * the shuffle carries one signature per (partition, group), not the corpus.
  */
case class MinHashAgg(child: Expression, numHashes: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "minhash_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private lazy val mins: Seq[AttributeReference] =
    (0 until numHashes).map(i => AttributeReference(s"min$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = mins

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(numHashes)(Literal(Hashes.MixP, LongType))

  override lazy val updateExpressions: Seq[Expression] =
    Hashes.mixConstants(numHashes).zip(mins).map { case ((a, b), m) =>
      val mixed = Remainder(
        Add(Multiply(Literal(a, LongType), child), Literal(b, LongType)),
        Literal(Hashes.MixP, LongType))
      If(IsNull(child), m, Least(Seq(m, mixed)))
    }

  override lazy val mergeExpressions: Seq[Expression] =
    mins.map(m => Least(Seq(m.left, m.right)))

  override lazy val evaluateExpression: Expression = CreateArray(mins)

  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Register `graft_minhash_agg(hash, numHashes)` in the session registry —
    * the public route from Column/SQL to the aggregate (Column->Expression
    * converters are private[sql] in Spark 4). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "graft_minhash_agg")(
      exprs => MinHashAgg(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()).toAggregateExpression())

  /** Column-API entry (after register): per-group minhash signature. */
  def minhashAgg(c: Column, numHashes: Int): Column =
    call_function("graft_minhash_agg", c, org.apache.spark.sql.functions.lit(numHashes))
}
