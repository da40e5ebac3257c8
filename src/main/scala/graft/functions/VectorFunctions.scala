package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` columns, computed in
  * double precision, as a native Catalyst expression with whole-stage
  * codegen (SURVEY.md §2.12: the one hot-loop candidate where a
  * built-in higher-order function — `aggregate`/`zip_with` — would
  * allocate a lambda frame per element; this compiles to a tight
  * primitive loop inside WholeStageCodegen instead).
  *
  * Accumulation order is sequential (i = 0..n-1), which matches both
  * the DuckDB oracle's `list_cosine_similarity(a::DOUBLE[],
  * b::DOUBLE[])` and a straightforward reference implementation —
  * results are bit-identical, not merely close.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkFloatArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // dimension mismatch -> NULL, never a silent prefix computation
    // (the DuckDB oracle errors on mismatched lengths; a wrong-but-
    // plausible similarity is the worst possible failure mode)
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      // NULL element -> NULL result (ArrayData.getFloat would unbox a
      // null slot to 0.0f — a wrong-but-plausible similarity; DuckDB's
      // list_cosine_similarity returns NULL here)
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i    = ctx.freshName("i")
      val n    = ctx.freshName("n")
      val dot  = ctx.freshName("dot")
      val nx   = ctx.freshName("nx")
      val ny   = ctx.freshName("ny")
      val xi   = ctx.freshName("xi")
      val yi   = ctx.freshName("yi")
      val den  = ctx.freshName("den")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  double $den = Math.sqrt($nx) * Math.sqrt($ny);
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns in double precision —
  * same codegen structure as [[CosineSimilarity]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorFunctions.checkFloatArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // see CosineSimilarity
    var dot = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("dot")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    $d += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $d; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared Euclidean distance over two `array<float>` columns in
  * double precision — same codegen structure as [[DotProduct]]. The
  * accumulation is the i-ascending single-accumulator fold, matching
  * the DuckDB oracle's `list_sum(list_transform(range(...), ...))`
  * per-position form bit for bit (the PQ oracle depends on this: the
  * per-subspace distance is fixed-pointed at 1e-6 AFTER this fold, and
  * all downstream arithmetic is integer-exact).
  *
  * Used by [[graft.queries.SimilarityOps.q_sim_pq]], where the encode
  * stage evaluates m·k of these per row — as one codegen'd call per
  * (subspace, centroid) the generated code stays within the JIT method
  * limits that a flattened (m·k·subDim)-term scalar expression tree
  * would blow past (the same consideration that shaped the LSH
  * sketch's `dot_product` form).
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  // Unlike cosine_sim/dot_product (float-only), sq_l2 also accepts
  // array<double> pairs: the IVF-PQ path runs it over RESIDUAL arrays
  // (float minus float centroid, computed in double so both engines
  // see identical bits — see q_sim_ivfpq).
  override def checkInputDataTypes(): TypeCheckResult = {
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(FloatType, _)  => Some(FloatType)
      case ArrayType(DoubleType, _) => Some(DoubleType)
      case _ => None
    }
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> or two array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_l2"

  override def nullable: Boolean = true

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null // see CosineSimilarity
    val f = isFloat
    var acc = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d =
        if (f) x.getFloat(i).toDouble - y.getFloat(i).toDouble
        else x.getDouble(i) - y.getDouble(i)
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val a = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val get = if (isFloat) "getFloat" else "getDouble"
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $a = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; continue; }
         |    double $d = (double) $x.$get($i) - (double) $y.$get($i);
         |    $a += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $a; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions hook: inject the vector functions at session
  * build time so every session (including SQL-only users) sees them
  * without an explicit register() call:
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.functions.GraftExtensions
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        val (l, r) = VectorFunctions.twoArgs("cosine_sim", exprs); CosineSimilarity(l, r)
      }))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        val (l, r) = VectorFunctions.twoArgs("dot_product", exprs); DotProduct(l, r)
      }))
    e.injectFunction((
      FunctionIdentifier("sq_l2"),
      new ExpressionInfo(classOf[SquaredL2].getName, "sq_l2"),
      (exprs: Seq[Expression]) => {
        val (l, r) = VectorFunctions.twoArgs("sq_l2", exprs); SquaredL2(l, r)
      }))
    e.injectFunction((
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => TextFunctions.makeNorm(exprs)))
    e.injectFunction((
      FunctionIdentifier("char_entropy_fp"),
      new ExpressionInfo(classOf[CharEntropyFp].getName, "char_entropy_fp"),
      (exprs: Seq[Expression]) => TextFunctions.makeEntropy(exprs)))
    // conf-gated optimizer rule: pure point-in-range inner joins
    // rewrite to the binned equi-join (see RewriteRangeJoinRule)
    e.injectOptimizerRule(s => new graft.plans.RewriteRangeJoinRule(s))
    // whole-operator custom plan: bounded-heap top-k per group
    // (TopKPerGroupNode -> partial/final execs; see plans.TopKPerGroup)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}

/** Upper-triangle pairwise products of a quantized (long) vector —
  * the codegen'd form of q_embed_cov's nested-transform pair build
  * (r16 opt): `flatten(transform(sequence(0, d−1), i =>
  * transform(sequence(i, d−1), j => struct(i, j, q[i]·q[j]))))` ran
  * as interpreted HOF lambdas over d(d+1)/2 = 2,080 struct
  * allocations per vector — the dominant cost of the shared
  * covariance-cell artifact (embed.covCells, 3.7s of the sf0.1
  * bench). One static call emits the same (i, j, p) triples in the
  * same row-major order; products are exact long multiplies on the
  * ×1e6 grid exactly as before (the decimal widening happens
  * DOWNSTREAM of the sum, unchanged). NULL vector → NULL; a NULL
  * element yields NULL products wherever the HOF form did
  * ([[graft.PairProductsSpec]] pins equality).
  */
case class PairProducts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.LongType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "pair_products"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    PairProducts.pairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.PairProducts.pairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairProducts {
  /** Static kernel (static forwarder, callable from generated Java). */
  def pairs(q: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val d = q.numElements()
    val out = new Array[Any](d * (d + 1) / 2)
    var idx = 0
    var i = 0
    while (i < d) {
      val iNull = q.isNullAt(i)
      val qi = if (iNull) 0L else q.getLong(i)
      var j = i
      while (j < d) {
        val p: Any =
          if (iNull || q.isNullAt(j)) null
          else java.lang.Long.valueOf(qi * q.getLong(j))
        out(idx) = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](i.toLong, j.toLong, p))
        idx += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFunctions {
  /** Analysis-time input validation (ExpectsInputTypes is unusable
    * outside org.apache.spark.sql — AbstractDataType is private[sql]).
    */
  private[functions] def checkFloatArrays(
      name: String, left: Expression, right: Expression): TypeCheckResult = {
    def isFloatArray(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  /** Register `cosine_sim` / `dot_product` for use via `expr(...)` and
    * SQL. Idempotent per session.
    */
  private[functions] def twoArgs(name: String, exprs: Seq[Expression]): (Expression, Expression) = {
    require(exprs.length == 2, s"$name requires exactly 2 arguments, got ${exprs.length}")
    (exprs(0), exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "cosine_sim", exprs => { val (l, r) = twoArgs("cosine_sim", exprs); CosineSimilarity(l, r) }, "built-in")
    reg.createOrReplaceTempFunction(
      "dot_product", exprs => { val (l, r) = twoArgs("dot_product", exprs); DotProduct(l, r) }, "built-in")
    reg.createOrReplaceTempFunction(
      "sq_l2", exprs => { val (l, r) = twoArgs("sq_l2", exprs); SquaredL2(l, r) }, "built-in")
    reg.createOrReplaceTempFunction(
      "pair_products", exprs => {
        require(exprs.length == 1,
          s"pair_products requires exactly 1 argument, got ${exprs.length}")
        PairProducts(exprs.head)
      }, "built-in")
  }
}
