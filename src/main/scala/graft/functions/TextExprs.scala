package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements that belong to a fixed marker set — the
  * codegen'd form of `size(filter(toks, t -> t IN ('the','a',…)))`.
  *
  * Why an expression: higher-order lambdas are CodegenFallback, so the
  * filter+IN form runs interpreted — one boxed lambda call and a
  * linear IN scan per TOKEN. That sits inside [[graft.llm.TextAnalysis
  * .textStats]] (the per-document stats every curation funnel computes,
  * q17/q43/q52/q78/q174/q187 and the streaming quality gate) and runs
  * once per profile in [[graft.llm.TextAnalysis.languageId]] (5× per
  * document in q50) — the engine's most-executed per-token loop. Here
  * it is one generated loop with a single hash probe per token.
  *
  * Semantics parity with the HOF form: null elements are skipped (IN
  * over a non-null list is null for a null probe, so `filter` drops
  * it), a null array is null (`size(null) = NULL` ≡ null-intolerant
  * propagation). Membership is exact binary equality — same as `=` on
  * strings in both engines.
  */
case class TokenSetCount(child: Expression, markers: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_set_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(markers.size * 2, 8))
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) {
         |    $c++;
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

/** Space-joined word n-grams of a token array — the native form of
  * `transform(sequence(1, size(t) - n + 1), i -> concat_ws(' ',
  * element_at(t, i), …))`.
  *
  * Why an expression: n-gram generation is the engine's most common
  * corpus-scan primitive (bigram LMs, shingles, DSIR features, top-
  * bigram boilerplate detection, repetition ratios), and the HOF form
  * pays an interpreted lambda + boxed sequence + per-element
  * `element_at` PER N-GRAM — the q143 sf1 profile measured it at
  * ~13 µs per bigram, 35 CPU-s for one 2.7M-bigram scan. This is one
  * generated call into a tight JVM loop (~0.2 µs per n-gram).
  *
  * Parity with the HOF form: fewer than `n` tokens → empty array;
  * null elements are skipped by the join exactly as `concat_ws` skips
  * them; a null token array is null.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(a: Any): Any =
    WordNgrams.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgrams$$.MODULE$$.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = new Array[Any](math.max(len - n + 1, 0))
    val win = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      var j = 0
      while (j < n) { win(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, win: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Space-join of the tokens NOT covered by any of a row's spans —
  * the reassembly step of span-level dedup
  * ([[graft.llm.Dedup.removeDupSpans]]): tokens is the document's
  * token array, (starts, ends) the SORTED, DISJOINT, inclusive
  * 0-based spans to drop (exactly what the gaps-and-islands merge
  * emits). One merge-walk per row — O(tokens + spans) — where the
  * higher-order `filter(…, exists(spans, …))` form is interpreted
  * and O(tokens·spans).
  *
  * Null semantics: any null input array → null row (null-intolerant);
  * null tokens are skipped (concat_ws convention). Spans outside the
  * token range simply cover nothing; `starts`/`ends` are paired by
  * position (extra elements of the longer array are ignored).
  */
case class JoinTokensExcept(tokens: Expression, starts: Expression,
                            ends: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "join_tokens_except"
  override def first: Expression = tokens
  override def second: Expression = starts
  override def third: Expression = ends

  override def nullSafeEval(t: Any, s: Any, e: Any): Any =
    JoinTokensExcept.compute(t.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, e) =>
      s"${ev.value} = graft.functions.JoinTokensExcept$$.MODULE$$.compute($t, $s, $e);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): JoinTokensExcept =
    copy(tokens = newFirst, starts = newSecond, ends = newThird)
}

object JoinTokensExcept {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, ss: ArrayData, es: ArrayData): UTF8String = {
    val n = toks.numElements()
    val m = math.min(ss.numElements(), es.numElements())
    val kept = new Array[UTF8String](n)
    var k = 0
    var sp = 0
    var i = 0
    while (i < n) {
      while (sp < m && es.getLong(sp) < i) sp += 1
      val covered = sp < m && ss.getLong(sp) <= i
      if (!covered && !toks.isNullAt(i)) {
        kept(k) = toks.getUTF8String(i)
        k += 1
      }
      i += 1
    }
    UTF8String.concatWs(Space, java.util.Arrays.copyOf(kept, k): _*)
  }
}

object TextExprs {
  /** Codegen'd marker-set occurrence count over a string array. */
  def tokenSetCount(tokens: Column, markers: Seq[String]): Column =
    Bridge.column(TokenSetCount(Bridge.expression(tokens), markers))

  /** Codegen'd space-joined word n-grams over a string array. */
  def wordNgrams(tokens: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(tokens), n))

  /** Codegen'd space-join of tokens outside the given sorted disjoint
    * spans ([[JoinTokensExcept]]).
    */
  def joinTokensExcept(tokens: Column, starts: Column,
                       ends: Column): Column =
    Bridge.column(JoinTokensExcept(Bridge.expression(tokens),
      Bridge.expression(starts.cast("array<bigint>")),
      Bridge.expression(ends.cast("array<bigint>"))))
}
