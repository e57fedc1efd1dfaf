package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding-similarity operators.
  *
  * A Scala UDF over two `Array[Float]` columns deserializes both arrays into
  * boxed `WrappedArray`s per row — at 100 TB that is the dominant cost of a
  * brute-force ANN scan. These expressions read the unsafe `ArrayData`
  * directly and participate in whole-stage codegen, so the similarity scan
  * stays inside one generated loop with the parquet reader.
  */
abstract class VectorBinaryExpression extends BinaryExpression with ExpectsInputTypes {
  // declared as Seq[DataType]: AbstractDataType is private[sql], and
  // Seq is covariant so this satisfies ExpectsInputTypes.inputTypes
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  /** Java source computing the result into `resultVar` from ArrayData vars. */
  protected def javaBody(a: String, b: String, resultVar: String): String

  protected def scalaEval(a: ArrayData, b: ArrayData): Double

  override def nullSafeEval(a: Any, b: Any): Any =
    scalaEval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => javaBody(a, b, ev.value))
}

/** Dot product of two float vectors, accumulated in double. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def javaBody(a: String, b: String, res: String): String =
    s"""
       |int n = $a.numElements();
       |double acc = 0.0;
       |for (int i = 0; i < n; i++) {
       |  acc += (double)$a.getFloat(i) * (double)$b.getFloat(i);
       |}
       |$res = acc;
     """.stripMargin

  override protected def scalaEval(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity; 0.0 when either vector has zero norm. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override protected def javaBody(a: String, b: String, res: String): String =
    s"""
       |int n = $a.numElements();
       |double dot = 0.0, na = 0.0, nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  double x = (double)$a.getFloat(i);
       |  double y = (double)$b.getFloat(i);
       |  dot += x * y; na += x * x; nb += y * y;
       |}
       |$res = (na == 0.0 || nb == 0.0) ? 0.0 : dot / (Math.sqrt(na) * Math.sqrt(nb));
     """.stripMargin

  override protected def scalaEval(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {
  @volatile private var registered = false

  /** Register `graft_dot` / `graft_cosine` in the session's function registry
    * so they are callable from both the Column API and SQL. */
  def register(spark: SparkSession): Unit = synchronized {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registered = true
  }

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
}
