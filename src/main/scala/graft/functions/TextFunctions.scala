package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — the canonicalization step a text pipeline runs BEFORE
  * fingerprint/MinHash dedup: the same visible string can arrive as
  * precomposed codepoints (é = U+00E9) or base + combining marks
  * (e + U+0301), and byte-level hashing treats those as different
  * documents unless the corpus is normalized first.
  *
  * Spark ships no normalization builtin, and a Scala UDF here would
  * add serialization overhead plus a codegen boundary in the hottest
  * per-row stage (normalization runs over every corpus byte). As a
  * UnaryExpression with `doGenCode` the call stays inside
  * WholeStageCodegen — the generated code is one static call into
  * `java.text.Normalizer` (ICU-equivalent tables bundled in every
  * JVM, the same no-new-dependency stance as the javax.imageio /
  * javax.sound codecs).
  *
  * Oracle parity: DuckDB exposes `nfc_normalize` (utf8proc). Both
  * implement Unicode Annex #15 canonical composition; divergence is
  * only possible for codepoints newer than one engine's Unicode
  * tables, which the corpus (and the spec fixtures) do not contain.
  * The NFD/NFKC/NFKD forms have no DuckDB counterpart and are pinned
  * by unit fixtures instead ([[graft.NormalizeSpec]]).
  *
  * The form is a constructor parameter (not a child expression): it
  * selects the algorithm, so a non-literal form would make the
  * expression's semantics row-dependent — rejected at analysis time
  * in [[TextFunctions.makeNorm]].
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val javaForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Already-normalized fast path: isNormalized is a table lookup per
    // char and true for ~all real corpus text (ASCII is always NFC) —
    // skipping the rebuild makes the common case allocation-free.
    if (Normalizer.isNormalized(s, javaForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      val formRef = s"java.text.Normalizer.Form.$form"
      s"""
         |java.lang.String $str = $c.toString();
         |if (java.text.Normalizer.isNormalized($str, $formRef)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str, $formRef));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The fixed-point character-entropy partial sum Σ round(nᵢ·ln nᵢ·1e12)
  * over per-character counts, as a codegen'd UnaryExpression — the
  * replacement for q_entropy's interpreted `aggregate` HOF fold
  * (Spark HOF lambdas run interpreted per (element, row); this is the
  * corpus-bytes-linear hot loop of the entropy filter, measured ~3.4s
  * of the sf0.1 bench). Contract is BIT-IDENTICAL to the SQL fold it
  * replaces (EntropyKernelSpec pins equality on random unicode
  * strings, and the DuckDB oracle is unchanged): characters are
  * `split(text, '')` units, runs are per-distinct-character counts,
  * each term is Spark-`round` (BigDecimal.valueOf HALF_UP) of
  * n·ln n·1e12, terms sum as exact longs in any order.
  */
case class CharEntropyFp(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "char_entropy_fp"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyFp.fp(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.CharEntropyFp.fp($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyFp {
  /** One run's fixed-point term, replicating Spark's `round(double)`
    * exactly: BigDecimal.valueOf (shortest-decimal) + HALF_UP — NOT
    * Math.round, whose floor(x+0.5) can differ at representation
    * boundaries.
    */
  private def term(n: Int): Long =
    java.math.BigDecimal.valueOf(n.toDouble * math.log(n.toDouble) * 1e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Static kernel (Scala object ⇒ static forwarder, callable from
    * generated Java). Sorting codepoints groups equal characters
    * adjacently — same run multiset as `aggregate(array_sort(...))`
    * over split-per-character units; run composition is all that
    * matters, not run order, because long addition commutes.
    */
  def fp(s: UTF8String): Long = {
    val cps = s.toString.codePoints().toArray
    java.util.Arrays.sort(cps)
    var acc = 0L; var run = 0; var i = 0
    while (i < cps.length) {
      if (run == 0 || cps(i) == cps(i - 1)) run += 1
      else { acc += term(run); run = 1 }
      i += 1
    }
    if (run > 0) acc += term(run)
    acc
  }
}

/** Packed (gram count << 32 | distinct gram count) over a document's
  * word n-grams, as a codegen'd UnaryExpression — the replacement for
  * q_repetition's interpreted HOF chain (three gram builds + three
  * array_distinct per row, each an interpreted lambda: Spark HOFs are
  * CodegenFallback, and one fallback evicts the whole projection from
  * whole-stage codegen — the round-4 lesson, here removed rather than
  * mitigated). Contract is BIT-IDENTICAL to the SQL form it replaces
  * ([[graft.GramStatsSpec]] pins equality on fixtures and random
  * strings): words = `split(text, ' ')` with limit −1 (trailing
  * empties kept, `''` for the empty string — probed Spark semantics),
  * gram i = words i..i+n−1 joined by one space (fewer than n words ⇒
  * zero grams, the fallbackToText=false branch), counts are the RAW
  * gram count and the distinct gram count. Both fit 32 bits by the
  * 2 GiB string-row bound, so one long carries the pair and the
  * consumer unpacks with shiftright/bitwiseAND — still inside codegen.
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "gram_stats"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    GramStats.packed(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.GramStats.packed($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramStats {
  /** Static kernel (static forwarder, callable from generated Java). */
  def packed(s: UTF8String, n: Int): Long = {
    // String.split(" ", -1) = Spark's split(text, ' '): literal-space
    // regex, limit -1 keeps trailing empties, "" yields [""]
    val ws = s.toString.split(" ", -1)
    if (n == 1) {
      val set = new java.util.HashSet[String](ws.length * 2)
      var i = 0
      while (i < ws.length) { set.add(ws(i)); i += 1 }
      (ws.length.toLong << 32) | set.size.toLong
    } else if (ws.length < n) 0L
    else {
      val cnt = ws.length - n + 1
      val set = new java.util.HashSet[String](cnt * 2)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < cnt) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        set.add(sb.toString)
        i += 1
      }
      (cnt.toLong << 32) | set.size.toLong
    }
  }
}

/** First-occurrence-ordered DISTINCT word n-gram array — the codegen'd
  * form of `array_distinct(shinglesN(text, n, fallbackToText = true))`
  * (r15 opt): the HOF chain ran interpreted at every distinct-shingle
  * site (the shared shingle artifact build, q_contamination's 5-gram
  * table, every exact-Jaccard confirm side). Semantics are
  * BIT-IDENTICAL for non-null text ([[graft.GramStatsSpec]] pins
  * equality): words = split(text, ' ') limit −1, grams join with one
  * space, fewer than n words falls back to the WHOLE original text as
  * the single gram, distinct keeps first occurrences in order. Null
  * text returns NULL (the callers all guard or are join-insensitive
  * to the [null]-vs-NULL distinction — see call sites).
  */
case class DistinctGrams(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_grams"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    DistinctGrams.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.DistinctGrams.grams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** RAW (order-preserving, duplicates kept) word n-gram array — the
  * codegen'd form of `shinglesN(text, n, fallbackToText)` itself, for
  * the explode sites where the downstream consumer needs every gram
  * occurrence (LM position tables, CMS lanes, winnow windows,
  * distinct-n). Same word/join semantics as [[DistinctGrams]];
  * `fallback` selects the short-text branch ([] vs [text]).
  */
case class WordGrams(child: Expression, n: Int, fallback: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WordGrams.grams(input.asInstanceOf[UTF8String], n, fallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.WordGrams.grams($c, $n, $fallback);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordGrams {
  /** Static kernel (static forwarder, callable from generated Java). */
  def grams(s: UTF8String, n: Int,
            fallback: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val text = s.toString
    val ws = text.split(" ", -1)
    if (ws.length < n) {
      if (fallback)
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](UTF8String.fromString(text)))
      else
        new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](0))
    } else {
      val cnt = ws.length - n + 1
      val arr = new Array[Any](cnt)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i < cnt) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        arr(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
    }
  }
}

object DistinctGrams {
  /** Static kernel (static forwarder, callable from generated Java). */
  def grams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val text = s.toString
    val ws = text.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]()
    if (ws.length < n) out.add(text)
    else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      val cnt = ws.length - n + 1
      while (i < cnt) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ws(i + j))
          j += 1
        }
        out.add(sb.toString)
        i += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

object TextFunctions {

  /** Build a [[UnicodeNormalize]] from SQL-call arguments: 1-arg form
    * defaults to NFC; the 2-arg form requires a foldable string
    * literal naming the form (the algorithm must be plan-time fixed).
    */
  private[functions] def makeNorm(exprs: Seq[Expression]): UnicodeNormalize = exprs match {
    case Seq(c) => UnicodeNormalize(c, "NFC")
    case Seq(c, Literal(f: UTF8String, StringType)) =>
      val form = f.toString.toUpperCase
      require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
        s"unicode_norm: unknown form '$form' (expected NFC/NFD/NFKC/NFKD)")
      UnicodeNormalize(c, form)
    case _ => throw new IllegalArgumentException(
      "unicode_norm requires (string) or (string, 'NFC'|'NFD'|'NFKC'|'NFKD' literal)")
  }

  private[functions] def makeEntropy(exprs: Seq[Expression]): CharEntropyFp = {
    require(exprs.length == 1,
      s"char_entropy_fp requires exactly 1 argument, got ${exprs.length}")
    CharEntropyFp(exprs.head)
  }

  /** Build a [[GramStats]]: (string, n) with n a foldable int literal
    * ≥ 1 — the gram order is plan-time fixed, like unicode_norm's form.
    */
  private[functions] def makeGramStats(exprs: Seq[Expression]): GramStats = exprs match {
    case Seq(c, Literal(n: Int, org.apache.spark.sql.types.IntegerType)) =>
      require(n >= 1, s"gram_stats: n must be >= 1, got $n")
      GramStats(c, n)
    case _ => throw new IllegalArgumentException(
      "gram_stats requires (string, int literal n >= 1)")
  }

  /** Build a [[DistinctGrams]] — same argument contract as
    * [[makeGramStats]]. */
  private[functions] def makeDistinctGrams(exprs: Seq[Expression]): DistinctGrams = exprs match {
    case Seq(c, Literal(n: Int, org.apache.spark.sql.types.IntegerType)) =>
      require(n >= 1, s"distinct_grams: n must be >= 1, got $n")
      DistinctGrams(c, n)
    case _ => throw new IllegalArgumentException(
      "distinct_grams requires (string, int literal n >= 1)")
  }

  /** Build a [[WordGrams]]: (string, int literal n ≥ 1, boolean
    * literal fallback). */
  private[functions] def makeWordGrams(exprs: Seq[Expression]): WordGrams = exprs match {
    case Seq(c, Literal(n: Int, org.apache.spark.sql.types.IntegerType),
        Literal(fb: Boolean, org.apache.spark.sql.types.BooleanType)) =>
      require(n >= 1, s"word_grams: n must be >= 1, got $n")
      WordGrams(c, n, fb)
    case _ => throw new IllegalArgumentException(
      "word_grams requires (string, int literal n >= 1, boolean literal)")
  }

  /** Register `unicode_norm` / `char_entropy_fp` for use via
    * `expr(...)` and SQL. Idempotent per session.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("unicode_norm", makeNorm, "built-in")
    reg.createOrReplaceTempFunction("char_entropy_fp", makeEntropy, "built-in")
    reg.createOrReplaceTempFunction("gram_stats", makeGramStats, "built-in")
    reg.createOrReplaceTempFunction("distinct_grams", makeDistinctGrams, "built-in")
    reg.createOrReplaceTempFunction("word_grams", makeWordGrams, "built-in")
  }
}
