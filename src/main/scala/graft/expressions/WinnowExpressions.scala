package graft.expressions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `winnow_fingerprints(text)`: distinct winnowing fingerprints (Schleimer
  * et al., SIGMOD'03) of a document in ONE pass — tokenize, 3-gram shingle,
  * md5 each shingle, rolling lexicographic MIN per sliding window of w=4,
  * first-occurrence dedup.
  *
  * Bit-identical to the Column formulation it replaces
  * (TextFunctions.shingleHashes + the slice/array_min sliding window, kept
  * as the tested reference spec) and to the DuckDB oracle. The native
  * version exists because the HOF chain needed a `repartition(doc_id)`
  * optimization fence — a full-corpus shuffle of text + hash arrays — to
  * stop Catalyst re-inlining the md5 chain per window position (measured
  * 60x), and the `slice` window re-reads w elements per position
  * interpreted. Here each shingle is hashed exactly once and the window MIN
  * is a tight loop; the operator becomes a stateless projection with no
  * exchange at all.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WinnowFingerprints$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val K = 3 // shingle width (tokens)
  private val W = 4 // winnowing window (shingle hashes)

  def compute(text: UTF8String): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    // positional shingle hashes (duplicates preserved — winnowing is
    // positional)
    val hs: Array[String] =
      if (words.length < K) Array(DigestUtils.md5Hex(words.mkString(" ")))
      else {
        val out = new Array[String](words.length - K + 1)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i <= words.length - K) {
          sb.setLength(0)
          sb.append(words(i)).append(' ').append(words(i + 1)).append(' ')
            .append(words(i + 2))
          out(i) = DigestUtils.md5Hex(sb.toString)
          i += 1
        }
        out
      }
    val seen = new java.util.LinkedHashSet[String]()
    if (hs.length < W) {
      var min = hs(0)
      var i = 1
      while (i < hs.length) {
        if (hs(i).compareTo(min) < 0) min = hs(i)
        i += 1
      }
      seen.add(min)
    } else {
      // O(n*w) with w=4 constant: 3 compares per window — cheaper and
      // simpler than a monotone deque at this window size.
      var i = 0
      while (i <= hs.length - W) {
        var min = hs(i)
        var j = i + 1
        while (j < i + W) {
          if (hs(j).compareTo(min) < 0) min = hs(j)
          j += 1
        }
        seen.add(min)
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
