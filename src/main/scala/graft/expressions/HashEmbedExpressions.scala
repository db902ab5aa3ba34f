package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hash_embed64(tokens, bucketStart, signPos)`: the dense signed
  * 64-bucket hashing-trick vector of a token array in ONE pass —
  * element-for-element identical to the HOF fold
  * `aggregate(transform(filter(toks, len>0), hashEmbedEntry), zeros64,
  * zip_with bump)` over the md5-nibble recipe (bucket = md5-hex chars
  * [bucketStart..bucketStart+3] (1-based, the `substring` convention) as
  * int mod 64; sign = hex char [signPos] in 0..7 ? +1 : -1; empty tokens
  * skipped — spec-pinned). Seed A (the engine-wide
  * [[graft.operators.TextPipeline.hashEmbedEntry]] recipe) is
  * (bucketStart=1, signPos=5); the ranker scorecard's independent seed-B
  * grade recipe is (6, 10).
  *
  * Exists because the HOF fold is the retrieval chain's hottest
  * expression and evaluates interpreted: per TOKEN it allocates a fresh
  * 64-element array (zip_with), a 64-element index sequence, and computes
  * md5 twice (once for the bucket, once for the sign). Here each token is
  * hashed once and bumps one slot of a single long[64] accumulator.
  */
case class HashEmbed64(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"hash_embed64 expects (array<string>, int, int), got " +
          s"${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def nullSafeEval(tokens: Any, bucketStart: Any,
      signPos: Any): Any =
    HashEmbed64.compute(tokens.asInstanceOf[ArrayData],
      bucketStart.asInstanceOf[Int], signPos.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, s) =>
      s"${ev.value} = graft.expressions.HashEmbed64$$.MODULE$$" +
        s".compute($a, $b, $s);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): HashEmbed64 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object HashEmbed64 {
  private val Dim = 64

  /** Hex char j of an md5 digest is nibble j: high nibble of byte j/2
    * for even j, low nibble for odd — so the bucket (4 hex chars as an
    * int) and the sign (hex char in 0..7 ⇔ nibble ≤ 7) read straight
    * off the raw digest with no hex string. */
  private def nibble(d: Array[Byte], j: Int): Int =
    if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf

  def compute(tokens: ArrayData, bucketStart: Int, signPos: Int): ArrayData = {
    val b0 = bucketStart - 1 // 1-based substring convention -> 0-based
    val s0 = signPos - 1
    val acc = new Array[Long](Dim)
    val tmp = new Array[Byte](16)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        Md5Util.digestInto(t.getBytes, tmp)
        // conv(hex[b0:b0+4], 16, 10) % 64 — always non-negative
        val bucket = ((nibble(tmp, b0) << 12) | (nibble(tmp, b0 + 1) << 8) |
          (nibble(tmp, b0 + 2) << 4) | nibble(tmp, b0 + 3)) % Dim
        val sgn = if (nibble(tmp, s0) <= 7) 1L else -1L
        acc(bucket) += sgn
      }
      i += 1
    }
    val out = new Array[Any](Dim)
    var k = 0
    while (k < Dim) { out(k) = acc(k); k += 1 }
    new GenericArrayData(out)
  }
}
