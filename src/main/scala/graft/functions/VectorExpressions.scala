package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftext.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst vector expressions (builder brief: custom `Expression`
  * with `doGenCode` beats a UDF): cosine similarity and dot product over
  * `array<float>`/`array<double>` columns.
  *
  * `CosineSim` fuses dot(a,b), |a|² and |b|² into ONE generated loop —
  * the higher-order-function formulation ([[Similarity.cosine]]) walks
  * the arrays three times through interpreted lambda dispatch; this stays
  * inside whole-stage codegen with a tight primitive loop, the shape that
  * matters when scoring 10⁹ embeddings. Null/length handling: null arrays
  * propagate null (BinaryExpression contract); mismatched lengths score
  * over the common prefix; null elements are read as 0.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def readElem(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  protected def readElemScala(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemIsFloat(e)) arr.getFloat(i).toDouble else arr.getDouble(i)
}

/** Σ aᵢ·bᵢ as a single codegen'd loop. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += readElemScala(left, x, i) * readElemScala(right, y, i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${readElem(left, a, i)} * ${readElem(right, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** cos(a,b) = Σab / (√Σa²·√Σb²) in one fused loop; 0 when either norm
  * is 0 (instead of NaN) so downstream top-k ordering stays total. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xv = readElemScala(left, x, i); val yv = readElemScala(right, y, i)
      ab += xv * yv; aa += xv * xv; bb += yv * yv; i += 1
    }
    if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${readElem(left, a, i)};
         |  double $yv = ${readElem(right, b, i)};
         |  $ab += $xv * $yv; $aa += $xv * $xv; $bb += $yv * $yv;
         |}
         |${ev.value} = ($aa == 0.0 || $bb == 0.0)
         |  ? 0.0 : $ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Count of positions where two `array<long>` columns hold equal values
  * (over the common prefix; null elements never match). The MinHash
  * signature-agreement kernel: `est_jaccard = eq_count / k`. A
  * codegen'd primitive loop — the `zip_with`/`filter`/`size` HOF chain
  * is interpreted and becomes the bottleneck when candidate expansion
  * evaluates millions of pairs. */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<long>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayEqCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayEqCount.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object ArrayEqCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      ArrayEqCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** [[DotProduct]] against a plan-time-constant vector
  * ([[graft.plans.FoldConstantVector]] rewrite target): the constant
  * rides as a primitive `double[]` reference object, so the generated
  * code no longer materializes a literal array per ROW before the loop.
  * Same min-length prefix semantics, same accumulation order →
  * bit-identical results. */
case class DotProductConst(child: Expression, vec: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(vec.nonEmpty, "DotProductConst needs a non-empty constant vector")

  // value-based equality over the Array param (see MinhashHashes)
  override def equals(o: Any): Boolean = o match {
    case d: DotProductConst => child == d.child && java.util.Arrays.equals(vec, d.vec)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Integer.valueOf(java.util.Arrays.hashCode(vec)))

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got $t")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    DotProductConst.compute(v.asInstanceOf[ArrayData], vec, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vec", vec, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DotProductConst.compute($c, $vRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): DotProductConst =
    copy(child = newChild)
}

object DotProductConst {
  def compute(x: ArrayData, v: Array[Double], isFloat: Boolean): Double = {
    val n = math.min(x.numElements(), v.length)
    var ab = 0.0
    var i = 0
    while (i < n) {
      val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      ab += xv * v(i); i += 1
    }
    ab
  }
}

/** [[CosineSim]] against a plan-time-constant vector: the constant's
  * norm `sqrt(Σv²)` is computed ONCE at rewrite time instead of once per
  * corpus row — an ANN scan against a broadcast/literal query vector
  * drops a third of its loop work. Bit-identical to [[CosineSim]]: the
  * precomputed norm is the same sequential accumulation the per-row loop
  * ran, and the final `ab / (sqrt(aa) * normV)` is the identical IEEE
  * operation sequence. Rows SHORTER than the constant fall back to the
  * exact prefix loop (CosineSim scores over the common prefix, where the
  * constant's prefix norm differs from its full norm). */
case class CosineSimConst(child: Expression, vec: Array[Double], normV: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(vec.nonEmpty, "CosineSimConst needs a non-empty constant vector")

  // value-based equality over the Array param (see MinhashHashes)
  override def equals(o: Any): Boolean = o match {
    case c: CosineSimConst =>
      child == c.child && normV == c.normV && java.util.Arrays.equals(vec, c.vec)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child, java.lang.Double.valueOf(normV),
      Integer.valueOf(java.util.Arrays.hashCode(vec)))

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got $t")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    CosineSimConst.compute(v.asInstanceOf[ArrayData], vec, normV, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("vec", vec, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CosineSimConst.compute($c, $vRef, $normV, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineSimConst =
    copy(child = newChild)
}

object CosineSimConst {
  /** Sequential Σv² — the same order CosineSim's per-row loop used, so
    * the folded norm is the bit-identical double. */
  def seqNorm(v: Array[Double]): Double = {
    var bb = 0.0
    var i = 0
    while (i < v.length) { bb += v(i) * v(i); i += 1 }
    math.sqrt(bb)
  }

  def compute(x: ArrayData, v: Array[Double], normV: Double, isFloat: Boolean): Double = {
    val nx = x.numElements()
    if (nx < v.length) {
      // prefix case: replicate CosineSim's exact three-accumulator loop
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < nx) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = v(i)
        ab += xv * yv; aa += xv * xv; bb += yv * yv; i += 1
      }
      if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
    } else {
      var ab = 0.0; var aa = 0.0
      var i = 0
      while (i < v.length) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        ab += xv * v(i); aa += xv * xv; i += 1
      }
      if (aa == 0.0 || normV == 0.0) 0.0 else ab / (math.sqrt(aa) * normV)
    }
  }
}

/** Map-side nearest-centroid assignment for k-means/IVF: argmax cosine
  * over a driver-broadcast centroid matrix, ties to the lower centroid
  * id (1-based). ONE fused expression means assignment is a pure
  * projection — no crossJoin against a centroid table, no per-vector
  * window, zero shuffle of the corpus (the shape Lloyd's iterations need
  * at 10⁹ vectors; MLlib's KMeans makes the same driver-collects-k×dim
  * trade). Null vector → null id.
  */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(centroids.nonEmpty, "NearestCentroid needs at least one centroid")

  // value-based (deep) equality over the nested-Array param (see
  // MinhashHashes)
  override def equals(o: Any): Boolean = o match {
    case n: NearestCentroid =>
      child == n.child &&
        java.util.Arrays.deepEquals(
          centroids.asInstanceOf[Array[AnyRef]], n.centroids.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Integer.valueOf(java.util.Arrays.deepHashCode(centroids.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got $t")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.nearest(v.asInstanceOf[ArrayData], centroids, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NearestCentroid.nearest($c, $cRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  /** 1-based argmax-cosine centroid id; ties resolve to the lower id. */
  def nearest(v: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int = {
    var best = 1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cen = centroids(c)
      val n = math.min(v.numElements(), cen.length)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val yv = cen(i)
        ab += xv * yv; aa += xv * xv; bb += yv * yv; i += 1
      }
      val sim = if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
      if (sim > bestSim) { bestSim = sim; best = c + 1 }
      c += 1
    }
    best
  }

  def apply(c: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(c), centroids))
}

/** Map-side best-match scan against a driver-broadcast vector matrix:
  * returns `struct(pos: int, cos: double)` — the 1-based argmax-cosine
  * row (ties to the LOWER position, [[NearestCentroid]]'s strict `>`)
  * and its cosine. One fused projection, so probing a bounded reference
  * set (an eval suite for semantic decontamination, a codebook, a
  * centroid table) costs ZERO shuffle of the corpus — the
  * [[NearestCentroid]] shape with the similarity value kept, for
  * callers that must threshold on it. Null vector → null struct.
  * Accumulator order matches [[CosineSim]]'s independent ab/aa/bb
  * chains, so the doubles are bit-identical to the oracle's chain SQL.
  */
case class BestCosine(child: Expression, matrix: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(matrix.nonEmpty, "BestCosine needs at least one reference vector")

  // value-based (deep) equality over the nested-Array param (see
  // NearestCentroid / MinhashHashes)
  override def equals(o: Any): Boolean = o match {
    case n: BestCosine =>
      child == n.child &&
        java.util.Arrays.deepEquals(
          matrix.asInstanceOf[Array[AnyRef]], n.matrix.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(getClass, child,
      Integer.valueOf(java.util.Arrays.deepHashCode(matrix.asInstanceOf[Array[AnyRef]])))

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("cos", DoubleType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expected array<float|double>, got $t")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    BestCosine.best(v.asInstanceOf[ArrayData], matrix, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BestCosine.best($c, $mRef, $elemIsFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): BestCosine =
    copy(child = newChild)
}

object BestCosine {
  /** (1-based argmax-cosine position, its cosine); ties → lower pos.
    * Same per-row accumulator loop as [[NearestCentroid.nearest]]. */
  def best(v: ArrayData, matrix: Array[Array[Double]], isFloat: Boolean): InternalRow = {
    var bestPos = 1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val ref = matrix(c)
      val n = math.min(v.numElements(), ref.length)
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val yv = ref(i)
        ab += xv * yv; aa += xv * xv; bb += yv * yv; i += 1
      }
      val sim = if (aa == 0.0 || bb == 0.0) 0.0 else ab / (math.sqrt(aa) * math.sqrt(bb))
      if (sim > bestSim) { bestSim = sim; bestPos = c + 1 }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestPos, bestSim))
  }

  def apply(c: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(BestCosine(ColumnBridge.expression(c), matrix))
}

/** Unit-normalize a vector in ONE codegen'd pass: nrm = √(Σxᵢ·xᵢ)
  * (the same left-to-right fold as [[DotProduct]] on equal inputs),
  * then each element xᵢ/nrm — or xᵢ unscaled when nrm == 0 (the
  * cosine guard's sibling). Bit-identical to the HOF formulation
  * `transform(v, x => when(√(dot(v,v)) === 0, x).otherwise(x / nrm))`
  * it replaces (`VectorExpressionsSpec` pins it): that shape was
  * interpreted (lambdas never codegen) AND, once predicate pushdown or
  * CollapseProject inlined it into a consumer, the norm dot sat INSIDE
  * the lambda and re-evaluated per ELEMENT per reference — the r18
  * ProfileProbe measured q_sim_ivfpq_cos's scoring scan as one 1.48 s
  * task from exactly that. A single opaque expression cannot be torn
  * apart by either rule: wherever it is inlined, the cost stays one
  * fused O(2·dim) loop. Output is always array<double> (float inputs
  * widen element-wise, the [[VectorBinaryExpression]] read rule). */
case class UnitNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expected array<float|double>, got $t")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val v = if (elemIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      out(i) = v
      s += v * v
      i += 1
    }
    val nrm = math.sqrt(s)
    if (nrm != 0.0) {
      i = 0
      while (i < n) { out(i) = out(i) / nrm; i += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nrm = ctx.freshName("nrm")
      val tmp = ctx.freshName("tmp")
      val read =
        if (elemIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double[] $tmp = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $tmp[$i] = $read;
         |  $s += $tmp[$i] * $tmp[$i];
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |if ($nrm != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) { $tmp[$i] = $tmp[$i] / $nrm; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($tmp);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object VectorExpressions {
  /** Column-level entry points. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def unitNorm(a: Column): Column =
    ColumnBridge.column(UnitNorm(ColumnBridge.expression(a)))
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Register `dot_product` / `cosine_sim` for `spark.sql` users. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", es => DotProduct(es.head, es(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", es => CosineSim(es.head, es(1)), "scala_udf")
  }
}
