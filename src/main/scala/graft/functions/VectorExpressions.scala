package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
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

/** Base for expressions that scan a BROADCAST centroid matrix per input row.
  *
  * The matrix rides in the expression as a `Broadcast` handle — one copy per
  * executor, zero plan literals — so the plan stays O(1) size regardless of
  * nCentroids x dim, and the scan participates in whole-stage codegen (the
  * earlier `transform`-HOF formulation evaluated the cosine interpreted per
  * centroid per row). Centroid norms are computed once per task from the
  * broadcast value, never per row.
  */
abstract class CentroidExpression extends UnaryExpression with ExpectsInputTypes {
  def centroids: Broadcast[Array[Array[Float]]]

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))

  @transient protected lazy val cents: Array[Array[Float]] = centroids.value
  @transient protected lazy val centNorms: Array[Double] = cents.map { cv =>
    var s = 0.0; var i = 0
    while (i < cv.length) { s += cv(i).toDouble * cv(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  protected def qNorm(q: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < q.length) { s += q(i).toDouble * q(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** cosine(q, cents(c)) with the same double-op order as [[CosineSimilarity]]
    * (dot accumulated ascending, first-arg norm times second-arg norm), so
    * scores are bit-identical to the crossJoin formulation the oracle mirrors. */
  protected def cosineTo(q: Array[Float], nq: Double, c: Int): Double = {
    val cv = cents(c)
    var dot = 0.0; var i = 0
    val m = math.min(q.length, cv.length)
    while (i < m) { dot += q(i).toDouble * cv(i).toDouble; i += 1 }
    if (nq == 0.0 || centNorms(c) == 0.0) 0.0 else dot / (nq * centNorms(c))
  }

  /** Instance fields in the generated class holding the unpacked broadcast
    * matrix and its norms; initialized once in `init()`, reused every row. */
  protected def centroidVars(ctx: CodegenContext): (String, String) = {
    val bcRef = ctx.addReferenceObj("centroidsBc", centroids,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    val cv = ctx.addMutableState("float[][]", "graftCents",
      v => s"$v = (float[][]) $bcRef.value();")
    val nv = ctx.addMutableState("double[]", "graftCentNorms", v =>
      s"""
         |$v = new double[$cv.length];
         |for (int c = 0; c < $cv.length; c++) {
         |  double s = 0.0; float[] x = $cv[c];
         |  for (int i = 0; i < x.length; i++) s += (double) x[i] * (double) x[i];
         |  $v[c] = Math.sqrt(s);
         |}
       """.stripMargin)
    (cv, nv)
  }
}

/** Index of the nearest centroid by cosine similarity (first/lowest index
  * wins ties — callers order centroids by id, so index-asc == id-asc). */
case class NearestCentroid(child: Expression, centroids: Broadcast[Array[Array[Float]]])
    extends CentroidExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData].toFloatArray()
    val nq = qNorm(q)
    var best = 0; var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cos = cosineTo(q, nq, c)
      if (cos > bestCos) { bestCos = cos; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (cv, nv) = centroidVars(ctx)
    val fn = ctx.freshName("graftNearestCentroid")
    val f = ctx.addNewFunction(fn,
      s"""
         |private int $fn(org.apache.spark.sql.catalyst.util.ArrayData arr) {
         |  float[] q = arr.toFloatArray();
         |  double nq = 0.0;
         |  for (int i = 0; i < q.length; i++) nq += (double) q[i] * (double) q[i];
         |  nq = Math.sqrt(nq);
         |  int best = 0; double bestCos = Double.NEGATIVE_INFINITY;
         |  for (int c = 0; c < $cv.length; c++) {
         |    float[] x = $cv[c];
         |    double dot = 0.0;
         |    int m = Math.min(q.length, x.length);
         |    for (int i = 0; i < m; i++) dot += (double) q[i] * (double) x[i];
         |    double cos = (nq == 0.0 || $nv[c] == 0.0) ? 0.0 : dot / (nq * $nv[c]);
         |    if (cos > bestCos) { bestCos = cos; best = c; }
         |  }
         |  return best;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $f($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Indices of the `nProbe` nearest centroids, cosine DESC then index ASC —
  * bounded insertion into two length-nProbe scratch arrays, no per-row sort
  * of the full centroid set. */
case class TopCentroids(child: Expression, centroids: Broadcast[Array[Array[Float]]],
                        nProbe: Int) extends CentroidExpression {
  require(nProbe > 0, "nProbe must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_centroids"

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData].toFloatArray()
    val nq = qNorm(q)
    val kk = math.min(nProbe, cents.length)
    val neg = new Array[Double](kk); val idx = new Array[Int](kk)
    var filled = 0; var c = 0
    while (c < cents.length) {
      val nc = -cosineTo(q, nq, c)
      var pos = filled
      while (pos > 0 && neg(pos - 1) > nc) pos -= 1
      if (pos < kk) {
        var j = math.min(filled, kk - 1)
        while (j > pos) { neg(j) = neg(j - 1); idx(j) = idx(j - 1); j -= 1 }
        neg(pos) = nc; idx(pos) = c
        if (filled < kk) filled += 1
      }
      c += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(idx, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (cv, nv) = centroidVars(ctx)
    val fn = ctx.freshName("graftTopCentroids")
    val f = ctx.addNewFunction(fn,
      s"""
         |private org.apache.spark.sql.catalyst.util.ArrayData $fn(
         |    org.apache.spark.sql.catalyst.util.ArrayData arr) {
         |  float[] q = arr.toFloatArray();
         |  double nq = 0.0;
         |  for (int i = 0; i < q.length; i++) nq += (double) q[i] * (double) q[i];
         |  nq = Math.sqrt(nq);
         |  int kk = Math.min($nProbe, $cv.length);
         |  double[] neg = new double[kk]; int[] idx = new int[kk];
         |  int filled = 0;
         |  for (int c = 0; c < $cv.length; c++) {
         |    float[] x = $cv[c];
         |    double dot = 0.0;
         |    int m = Math.min(q.length, x.length);
         |    for (int i = 0; i < m; i++) dot += (double) q[i] * (double) x[i];
         |    double cos = (nq == 0.0 || $nv[c] == 0.0) ? 0.0 : dot / (nq * $nv[c]);
         |    double nc = -cos;
         |    int pos = filled;
         |    while (pos > 0 && neg[pos - 1] > nc) pos--;
         |    if (pos < kk) {
         |      for (int j = Math.min(filled, kk - 1); j > pos; j--) {
         |        neg[j] = neg[j - 1]; idx[j] = idx[j - 1];
         |      }
         |      neg[pos] = nc; idx[pos] = c;
         |      if (filled < kk) filled++;
         |    }
         |  }
         |  return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
         |    java.util.Arrays.copyOf(idx, filled));
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $f($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization encoder: the input vector is cut into `m` equal
  * subspaces and each subspace is replaced by the index of its nearest
  * (squared-L2) codeword in that subspace's codebook — 8 bytes of codes per
  * vector instead of dim x 4 bytes of floats. The codebook rides in the
  * expression as a broadcast (m x ksub x dsub floats, one copy per
  * executor, zero plan literals), and encoding is a zero-shuffle projection
  * inside whole-stage codegen. Lowest code index wins distance ties. */
case class PqEncode(child: Expression,
                    codebooks: Broadcast[Array[Array[Array[Float]]]])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  @transient private lazy val cbs: Array[Array[Array[Float]]] = codebooks.value

  override def nullSafeEval(v: Any): Any = {
    val q = v.asInstanceOf[ArrayData].toFloatArray()
    val m = cbs.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val book = cbs(s)
      val dsub = if (book.isEmpty) 0 else book(0).length
      val base = s * dsub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0; var i = 0
        while (i < cw.length) {
          val x = (if (base + i < q.length) q(base + i).toDouble else 0.0) - cw(i).toDouble
          d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqCodebooksBc", codebooks,
      classOf[Broadcast[Array[Array[Array[Float]]]]].getName)
    val cb = ctx.addMutableState("float[][][]", "graftPqBooks",
      v => s"$v = (float[][][]) $bcRef.value();")
    val fn = ctx.freshName("graftPqEncode")
    val f = ctx.addNewFunction(fn,
      s"""
         |private org.apache.spark.sql.catalyst.util.ArrayData $fn(
         |    org.apache.spark.sql.catalyst.util.ArrayData arr) {
         |  float[] q = arr.toFloatArray();
         |  int m = $cb.length;
         |  int[] codes = new int[m];
         |  for (int s = 0; s < m; s++) {
         |    float[][] book = $cb[s];
         |    int dsub = book.length == 0 ? 0 : book[0].length;
         |    int base = s * dsub;
         |    int best = 0; double bestD = Double.MAX_VALUE;
         |    for (int c = 0; c < book.length; c++) {
         |      float[] cw = book[c];
         |      double d = 0.0;
         |      for (int i = 0; i < cw.length; i++) {
         |        double x = (base + i < q.length ? (double) q[base + i] : 0.0)
         |          - (double) cw[i];
         |        d += x * x;
         |      }
         |      if (d < bestD) { bestD = d; best = c; }
         |    }
         |    codes[s] = best;
         |  }
         |  return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray(codes);
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $f($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric PQ distance: squared L2 between a RAW query vector and the
  * RECONSTRUCTION of a PQ-coded corpus vector — Σ_s ||q_s - codeword(s,
  * code_s)||², accumulated per subspace in code order (the ADC identity:
  * per-subspace lookups sum to the exact distance to the decoded vector).
  * The scan reads only the code arrays (m ints) per corpus row — the PQ
  * win at scale is memory bandwidth, not FLOPs — and stays inside
  * whole-stage codegen. */
case class PqAdcDistance(left: Expression, right: Expression,
                         codebooks: Broadcast[Array[Array[Array[Float]]]])
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_distance"

  @transient private lazy val cbs: Array[Array[Array[Float]]] = codebooks.value

  override def nullSafeEval(codesAny: Any, qAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = qAny.asInstanceOf[ArrayData].toFloatArray()
    val m = math.min(cbs.length, codes.numElements())
    var acc = 0.0
    var s = 0
    while (s < m) {
      val book = cbs(s)
      val dsub = if (book.isEmpty) 0 else book(0).length
      val base = s * dsub
      val cw = book(codes.getInt(s))
      var i = 0
      while (i < cw.length) {
        val x = (if (base + i < q.length) q(base + i).toDouble else 0.0) - cw(i).toDouble
        acc += x * x; i += 1
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("pqCodebooksBc", codebooks,
      classOf[Broadcast[Array[Array[Array[Float]]]]].getName)
    val cb = ctx.addMutableState("float[][][]", "graftPqBooks",
      v => s"$v = (float[][][]) $bcRef.value();")
    val fn = ctx.freshName("graftPqAdc")
    val f = ctx.addNewFunction(fn,
      s"""
         |private double $fn(org.apache.spark.sql.catalyst.util.ArrayData codes,
         |    org.apache.spark.sql.catalyst.util.ArrayData arr) {
         |  float[] q = arr.toFloatArray();
         |  int m = Math.min($cb.length, codes.numElements());
         |  double acc = 0.0;
         |  for (int s = 0; s < m; s++) {
         |    float[][] book = $cb[s];
         |    int dsub = book.length == 0 ? 0 : book[0].length;
         |    int base = s * dsub;
         |    float[] cw = book[codes.getInt(s)];
         |    for (int i = 0; i < cw.length; i++) {
         |      double x = (base + i < q.length ? (double) q[base + i] : 0.0)
         |        - (double) cw[i];
         |      acc += x * x;
         |    }
         |  }
         |  return acc;
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $f($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dense projection y = scale * (M·x) against a broadcast float matrix —
  * the Johnson–Lindenstrauss / PCA-style dimensionality-reduction kernel.
  * One codegen'd loop nest per row (outDim × inDim double multiply-adds,
  * ascending index order), no plan literals: the matrix rides the broadcast
  * exactly like the centroid/codebook expressions above, so a 100 TB
  * projection pass is a zero-shuffle map with the matrix resident per
  * executor, not serialized per task. */
case class MatVecProject(child: Expression,
                         matrix: Broadcast[Array[Array[Float]]], scale: Double)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec_project"

  @transient private lazy val m: Array[Array[Float]] = matrix.value

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData].toFloatArray()
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var acc = 0.0; var i = 0
      val n = math.min(row.length, x.length)
      while (i < n) { acc += row(i).toDouble * x(i).toDouble; i += 1 }
      out(j) = acc * scale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("matVecBc", matrix,
      classOf[Broadcast[Array[Array[Float]]]].getName)
    val mv = ctx.addMutableState("float[][]", "graftMatVecM",
      v => s"$v = (float[][]) $bcRef.value();")
    val fn = ctx.freshName("graftMatVec")
    val f = ctx.addNewFunction(fn,
      s"""
         |private org.apache.spark.sql.catalyst.util.GenericArrayData $fn(
         |    org.apache.spark.sql.catalyst.util.ArrayData arr) {
         |  float[] x = arr.toFloatArray();
         |  double[] out = new double[$mv.length];
         |  for (int j = 0; j < $mv.length; j++) {
         |    float[] row = $mv[j];
         |    double acc = 0.0;
         |    int n = Math.min(row.length, x.length);
         |    for (int i = 0; i < n; i++) acc += (double) row[i] * (double) x[i];
         |    out[j] = acc * $scale;
         |  }
         |  return new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $f($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) over a
  * BOUNDED candidate array: input array<struct<id:long, rel:double,
  * v:array<float>>> (a per-query top-N, so per-group state is N rows by
  * construction), output the k greedy picks as array<struct<id:long,
  * mmr:double>> in selection order. Each step scores unpicked candidates
  * λ·rel − μ·max(cos to any picked) with ties broken by id; μ is passed
  * explicitly (not recomputed as 1−λ) so engines replaying the arithmetic
  * use the identical double constant. The greedy is O(k·N·dim) per group —
  * sequential by nature, which is exactly why it lives in one expression
  * over the grouped array instead of k join rounds. */
case class MmrSelect(child: Expression, k: Int, lambda: Double, mu: Double)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("rel", DoubleType),
    StructField("v", ArrayType(FloatType))))))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("mmr", DoubleType))),
    containsNull = false)
  override def prettyName: String = "mmr_select"

  override def nullSafeEval(candsAny: Any): Any = {
    val cands = candsAny.asInstanceOf[ArrayData]
    val n = cands.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Float]](n)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = cands.getStruct(i, 3)
      ids(i) = r.getLong(0); rels(i) = r.getDouble(1)
      vecs(i) = r.getArray(2).toFloatArray()
      var s = 0.0; var d = 0
      while (d < vecs(i).length) {
        s += vecs(i)(d).toDouble * vecs(i)(d).toDouble; d += 1
      }
      norms(i) = math.sqrt(s)
      i += 1
    }
    def cos(a: Int, b: Int): Double = {
      var dot = 0.0; var d = 0
      val m = math.min(vecs(a).length, vecs(b).length)
      while (d < m) { dot += vecs(a)(d).toDouble * vecs(b)(d).toDouble; d += 1 }
      if (norms(a) == 0.0 || norms(b) == 0.0) 0.0 else dot / (norms(a) * norms(b))
    }
    val picked = new Array[Boolean](n)
    val sel = new Array[Int](math.min(k, n))
    val out = new Array[Any](sel.length)
    var step = 0
    while (step < sel.length) {
      var best = -1; var bestScore = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!picked(i)) {
          var maxSim = 0.0
          var j = 0
          while (j < step) {
            val s = cos(i, sel(j)); if (s > maxSim) maxSim = s; j += 1
          }
          val score = lambda * rels(i) - mu * maxSim
          if (score > bestScore ||
              (score == bestScore && (best == -1 || ids(i) < ids(best)))) {
            best = i; bestScore = score
          }
        }
        i += 1
      }
      picked(best) = true; sel(step) = best
      out(step) = org.apache.spark.sql.catalyst.InternalRow(ids(best), bestScore)
      step += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = ctx.freshName("graftMmr")
    val f = ctx.addNewFunction(fn,
      s"""
         |private org.apache.spark.sql.catalyst.util.GenericArrayData $fn(
         |    org.apache.spark.sql.catalyst.util.ArrayData cands) {
         |  int n = cands.numElements();
         |  long[] ids = new long[n];
         |  double[] rels = new double[n];
         |  float[][] vecs = new float[n][];
         |  double[] norms = new double[n];
         |  for (int i = 0; i < n; i++) {
         |    org.apache.spark.sql.catalyst.InternalRow r = cands.getStruct(i, 3);
         |    ids[i] = r.getLong(0); rels[i] = r.getDouble(1);
         |    vecs[i] = r.getArray(2).toFloatArray();
         |    double s = 0.0;
         |    for (int d = 0; d < vecs[i].length; d++)
         |      s += (double) vecs[i][d] * (double) vecs[i][d];
         |    norms[i] = Math.sqrt(s);
         |  }
         |  boolean[] picked = new boolean[n];
         |  int kk = Math.min($k, n);
         |  int[] sel = new int[kk];
         |  Object[] out = new Object[kk];
         |  for (int step = 0; step < kk; step++) {
         |    int best = -1; double bestScore = Double.NEGATIVE_INFINITY;
         |    for (int i = 0; i < n; i++) {
         |      if (picked[i]) continue;
         |      double maxSim = 0.0;
         |      for (int j = 0; j < step; j++) {
         |        int o = sel[j];
         |        double dot = 0.0;
         |        int m = Math.min(vecs[i].length, vecs[o].length);
         |        for (int d = 0; d < m; d++)
         |          dot += (double) vecs[i][d] * (double) vecs[o][d];
         |        double sim = (norms[i] == 0.0 || norms[o] == 0.0)
         |          ? 0.0 : dot / (norms[i] * norms[o]);
         |        if (sim > maxSim) maxSim = sim;
         |      }
         |      double score = $lambda * rels[i] - $mu * maxSim;
         |      if (score > bestScore ||
         |          (score == bestScore && (best == -1 || ids[i] < ids[best]))) {
         |        best = i; bestScore = score;
         |      }
         |    }
         |    picked[best] = true; sel[step] = best;
         |    out[step] = new org.apache.spark.sql.catalyst.expressions
         |      .GenericInternalRow(new Object[] {
         |        java.lang.Long.valueOf(ids[best]),
         |        java.lang.Double.valueOf(bestScore) });
         |  }
         |  return new org.apache.spark.sql.catalyst.util.GenericArrayData(out);
         |}
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $f($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  @volatile private var registered = false

  /** Register `graft_dot` / `graft_cosine` in the session's function registry
    * so they are callable from both the Column API and SQL. */
  def register(spark: SparkSession): Unit = synchronized {
    Registry.ensure(spark, "graft_dot")(exprs => DotProduct(exprs(0), exprs(1)))
    Registry.ensure(spark, "graft_cosine")(
      exprs => CosineSimilarity(exprs(0), exprs(1)))
    registered = true
  }

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  /** Column wrapping [[NearestCentroid]]. Column->Expression converters are
    * private[sql] in Spark 4, so the broadcast-carrying expression goes
    * through the registry under a per-broadcast name (re-registering the same
    * broadcast is idempotent; distinct centroid sets never collide). */
  def nearestCentroid(spark: SparkSession, vec: Column,
                      bc: Broadcast[Array[Array[Float]]]): Column = {
    val name = s"graft_nearest_centroid_${bc.id}"
    Registry.ensure(spark, name)(exprs => NearestCentroid(exprs(0), bc))
    call_function(name, vec)
  }

  /** Column wrapping [[TopCentroids]] — same registry route. */
  def topCentroids(spark: SparkSession, vec: Column,
                   bc: Broadcast[Array[Array[Float]]], nProbe: Int): Column = {
    val name = s"graft_top_centroids_${bc.id}_$nProbe"
    Registry.ensure(spark, name)(exprs => TopCentroids(exprs(0), bc, nProbe))
    call_function(name, vec)
  }

  /** Column wrapping [[PqEncode]] — registry route, per-broadcast name. */
  def pqEncode(spark: SparkSession, vec: Column,
               bc: Broadcast[Array[Array[Array[Float]]]]): Column = {
    val name = s"graft_pq_encode_${bc.id}"
    Registry.ensure(spark, name)(exprs => PqEncode(exprs(0), bc))
    call_function(name, vec)
  }

  /** Column wrapping [[PqAdcDistance]] — registry route, per-broadcast name. */
  def pqAdcDistance(spark: SparkSession, codes: Column, qv: Column,
                    bc: Broadcast[Array[Array[Array[Float]]]]): Column = {
    val name = s"graft_pq_adc_${bc.id}"
    Registry.ensure(spark, name)(exprs => PqAdcDistance(exprs(0), exprs(1), bc))
    call_function(name, codes, qv)
  }

  /** Column wrapping [[MatVecProject]] — registry route, per-broadcast name
    * (scale is part of the name so two projections sharing a matrix but not
    * a scale can't collide). */
  def matVecProject(spark: SparkSession, vec: Column,
                    bc: Broadcast[Array[Array[Float]]], scale: Double): Column = {
    val name = s"graft_matvec_${bc.id}_${java.lang.Double.doubleToLongBits(scale)}"
    Registry.ensure(spark, name)(exprs => MatVecProject(exprs(0), bc, scale))
    call_function(name, vec)
  }

  /** Column wrapping [[MmrSelect]] — registry route; the (k, λ) operating
    * point is part of the name so differing rerank configs coexist. */
  def mmrSelect(spark: SparkSession, cands: Column, k: Int, lambda: Double,
                mu: Double): Column = {
    val name = s"graft_mmr_${k}_${java.lang.Double.doubleToLongBits(lambda)}"
    Registry.ensure(spark, name)(exprs => MmrSelect(exprs(0), k, lambda, mu))
    call_function(name, cands)
  }

  /** Release a PQ codebook broadcast — same lifecycle contract as
    * [[releaseCentroidBroadcast]]. */
  def releasePqBroadcast(spark: SparkSession,
                         bc: Broadcast[Array[Array[Array[Float]]]]): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.listFunction()
      .filter(f => f.funcName == s"graft_pq_encode_${bc.id}" ||
        f.funcName == s"graft_pq_adc_${bc.id}")
      .foreach(reg.dropFunction)
    bc.destroy()
  }

  /** Release a centroid broadcast once every action that uses it has run:
    * destroys the broadcast and drops its per-broadcast registry entries, so
    * iterative callers (Lloyd training) and long-lived sessions don't
    * accumulate executor memory or registry names. Callers that RETURN a lazy
    * plan holding the broadcast must not call this before the caller's
    * action. */
  def releaseCentroidBroadcast(spark: SparkSession,
                               bc: Broadcast[Array[Array[Float]]]): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.listFunction()
      .filter(f => f.funcName == s"graft_nearest_centroid_${bc.id}" ||
        f.funcName.startsWith(s"graft_top_centroids_${bc.id}_"))
      .foreach(reg.dropFunction)
    bc.destroy()
  }
}
