package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `shingle_set(text)`: distinct word 3-gram shingles in first-occurrence
  * order — one pass over the text, replacing the interpreted
  * split -> transform(slice + concat_ws) -> array_distinct chain
  * (TextFunctions.shingleSet, which stays as the tested reference spec).
  * Exact-match semantics: single-space tokenization, k=3, short texts
  * collapse to one whole-text shingle, first-occurrence dedup order.
  */
case class ShingleSet(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects string, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleSet.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.ShingleSet$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  private val K = 3

  def compute(text: UTF8String): GenericArrayData = {
    val words = text.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String]()
    if (words.length < K) {
      seen.add(words.mkString(" "))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - K) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1)).append(' ')
          .append(words(i + 2))
        seen.add(sb.toString)
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
