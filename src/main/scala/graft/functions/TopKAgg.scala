package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded top-k as a native Catalyst aggregate: per group, the k SMALLEST
  * elements of `child` under natural ordering (structs sort
  * lexicographically, so callers encode "cosine DESC, id ASC" as
  * `struct(-cosine, id)` and read the k smallest back).
  *
  * The buffer never exceeds k elements and the aggregate participates in
  * map-side partial aggregation, so a brute-force ANN scan shuffles at most
  * k rows per (input partition, query) instead of the full N x Q scored
  * set — the per-query merge then touches k x partitions rows, not N.
  * The update path appends + sorts only when the new element actually beats
  * the current worst, so the steady-state per-row cost is one struct compare.
  */
case class TopKAgg(child: Expression, k: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_agg"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  private lazy val buf: AttributeReference =
    AttributeReference("topk", dataType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(new GenericArrayData(Array.empty[Any]), dataType))

  override lazy val updateExpressions: Seq[Expression] = {
    val appended = Slice(
      SortArray(Concat(Seq(buf, CreateArray(Seq(child)))), Literal(true)),
      Literal(1), Literal(k))
    // Or short-circuits: ElementAt(buf, -1) is only reached when the buffer
    // is full (size >= k >= 1), never on the empty initial buffer.
    val better = Or(
      LessThan(Size(buf), Literal(k)),
      LessThan(child, ElementAt(buf, Literal(-1))))
    Seq(If(IsNull(child), buf, If(better, appended, buf)))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Slice(SortArray(Concat(Seq(buf.left, buf.right)), Literal(true)),
      Literal(1), Literal(k)))

  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** Register `graft_topk_agg(elem, k)` in the session registry (Column ->
    * Expression converters are private[sql] in Spark 4, same route as
    * [[MinHashAgg]]). */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, "graft_topk_agg")(
      exprs => TopKAgg(exprs(0),
        exprs(1).eval(null).asInstanceOf[Number].intValue()).toAggregateExpression())

  /** Column-API entry (after register): ascending-sorted array of the group's
    * k smallest elements. */
  def topK(c: Column, k: Int): Column =
    call_function("graft_topk_agg", c, org.apache.spark.sql.functions.lit(k))
}
