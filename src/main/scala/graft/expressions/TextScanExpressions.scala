package graft.expressions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** One-pass document-scan expressions in the [[WinnowFingerprints]] mold:
  * work that is per-document and loop-shaped runs as a single codegen'd
  * native call instead of a HOF chain that (a) needs a `repartition(doc_id)`
  * optimization fence — a full-corpus shuffle — to stop Catalyst re-inlining
  * the tokenize per reference, and (b) re-reads array slices interpreted.
  * Consumed through `inline`/`explode` (a Generate node), so each document
  * is tokenized exactly once with NO exchange; the operators become pure
  * scan-parallel projections at any corpus size.
  */

/** `graft_sliding_chunks(text, win, stride)`: the retrieval-prep splitter —
  * overlapping `win`-token windows every `stride` tokens, tail window short.
  * Emits one struct per chunk: (chunk_idx, start_tok, n_tokens, chunk_md5).
  * Bit-identical to the sequence/slice Column formulation it replaces (and
  * to the DuckDB oracle): integer-exact chunk count, md5 over the
  * space-joined chunk tokens.
  */
case class SlidingChunks(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def dataType: DataType = SlidingChunks.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"sliding_chunks expects (string, int, int), got ${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def nullSafeEval(text: Any, win: Any, stride: Any): Any =
    SlidingChunks.compute(text.asInstanceOf[UTF8String],
      win.asInstanceOf[Int], stride.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, s) =>
      s"${ev.value} = graft.expressions.SlidingChunks$$.MODULE$$.compute($t, $w, $s);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SlidingChunks =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SlidingChunks {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("start_tok", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("chunk_md5", StringType, nullable = false))),
    containsNull = false)

  def compute(text: UTF8String, win: Int, stride: Int): GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val nChunks =
      if (n <= win) 1 else ((n - win + stride - 1) / stride + 1)
    val out = new Array[Any](nChunks)
    val sb = new java.lang.StringBuilder(64)
    var idx = 0
    while (idx < nChunks) {
      val start = idx * stride
      val end = math.min(start + win, n)
      sb.setLength(0)
      var i = start
      while (i < end) {
        if (i > start) sb.append(' ')
        sb.append(toks(i))
        i += 1
      }
      out(idx) = new GenericInternalRow(Array[Any](
        idx.toLong, start.toLong, (end - start).toLong,
        UTF8String.fromString(DigestUtils.md5Hex(sb.toString))))
      idx += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_lang_id(text)`: multi-profile stopword language ID in one token
  * pass — counts hits against ALL profiles simultaneously and returns
  * (lang_pred, best_score) with ties broken to the first profile in
  * [[graft.functions.TextFunctions.LangProfiles]] order, exactly like the
  * greatest/CASE Column chain it replaces (which re-counted every profile
  * ~3x through the argmax references unless fenced behind a full-corpus
  * shuffle).
  */
case class LangIdBest(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangIdBest.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    LangIdBest.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.LangIdBest$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): LangIdBest =
    copy(child = newChild)
}

object LangIdBest {
  val schema: DataType = StructType(Seq(
    StructField("lang_pred", StringType, nullable = false),
    StructField("best_score", LongType, nullable = false)))

  private val profiles: Array[(UTF8String, java.util.HashSet[String])] =
    graft.functions.TextFunctions.LangProfiles.map { case (lang, words) =>
      val set = new java.util.HashSet[String]()
      words.foreach(set.add)
      (UTF8String.fromString(lang), set)
    }.toArray

  def compute(text: UTF8String): GenericInternalRow = {
    val toks = text.toString.split(" ", -1)
    val scores = new Array[Long](profiles.length)
    var i = 0
    while (i < toks.length) {
      var p = 0
      while (p < profiles.length) {
        if (profiles(p)._2.contains(toks(i))) scores(p) += 1
        p += 1
      }
      i += 1
    }
    var best = 0
    var p = 1
    while (p < profiles.length) {
      if (scores(p) > scores(best)) best = p // strict: first max wins ties
      p += 1
    }
    new GenericInternalRow(Array[Any](profiles(best)._1, scores(best)))
  }
}

/** `graft_rep_stats(text)`: Gopher-style repetition signals in ONE token
  * pass — for n = 1, 2, 3, the fraction of n-gram occurrences whose n-gram
  * appears at least twice in the document, as
  * (n_words, dup_word_frac, dup_2gram_frac, dup_3gram_frac), fractions
  * rounded HALF_UP to 4 dp exactly like the Column round / DuckDB oracle.
  * Replaces a sort+adjacency HOF chain whose interpreted per-element
  * lambdas made rep_stats the slowest bench query (7.1 s -> native).
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepStats.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rep_stats expects string, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    RepStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.RepStats$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {
  val schema: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false),
    StructField("dup_2gram_frac", DoubleType, nullable = false),
    StructField("dup_3gram_frac", DoubleType, nullable = false)))

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Duplicate-occurrence fraction of the n-grams of `toks`: occurrences
    * belonging to a gram with count >= 2, over total gram count.
    */
  private def dupFrac(toks: Array[String], n: Int): Double = {
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val key = sb.toString
      counts.put(key, counts.getOrDefault(key, 0) + 1)
      i += 1
    }
    var dups = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c >= 2) dups += c
    }
    round4(dups.toDouble / total)
  }

  def compute(text: UTF8String): GenericInternalRow = {
    val toks = text.toString.split(" ", -1)
    new GenericInternalRow(Array[Any](
      toks.length.toLong,
      dupFrac(toks, 1), dupFrac(toks, 2), dupFrac(toks, 3)))
  }
}
