package graft.expressions

import org.apache.commons.codec.digest.DigestUtils
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** `minhash_bands(shingleSet)`: all 4 MinHash LSH band digests in ONE pass
  * over the shingle set.
  *
  * Bit-identical to the Column formulation
  * (TextFunctions.lshBandDigests: band_b = md5 over "|"-joined min-hashes,
  * min-hash k = lexicographic MIN of md5("k:" + shingle)) and to the DuckDB
  * oracle — same md5, same seeds, same joins. The native version exists
  * because the HOF chain materializes 16 intermediate arrays per row and
  * evaluates interpreted; here each shingle string is read once and hashed
  * 16 times in a tight loop.
  */
case class MinHashBandDigests(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<string>, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashBandDigests.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinHashBandDigests$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandDigests =
    copy(child = newChild)
}

/** `minhash1(shingleSet, seed)`: ONE seeded min-hash — the lexicographic MIN
  * of `md5(seed || ':' || shingle)` over the set, in one pass. Bit-identical
  * to the HOF `array_min(transform(s, md5(seed:s)))` (TextFunctions.minHash,
  * kept as the tested spec) and to the DuckDB oracle; exists because the HOF
  * evaluates interpreted with per-element boxing — this is the blocking key
  * of the global-min-hash dedup (dedup_jaccard), computed for every document.
  */
case class MinHashOne(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"minhash1 expects (array<string>, int), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(shingles: Any, seed: Any): Any =
    MinHashOne.compute(
      shingles.asInstanceOf[ArrayData], seed.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) =>
      s"${ev.value} = graft.expressions.MinHashOne$$.MODULE$$.compute($a, $s);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashOne =
    copy(left = newLeft, right = newRight)
}

object MinHashOne {
  def compute(shingles: ArrayData, seed: Int): UTF8String = {
    var min: String = null
    val prefix = seed + ":"
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val h = DigestUtils.md5Hex(prefix + shingles.getUTF8String(i).toString)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    if (min == null) null else UTF8String.fromString(min)
  }
}

object MinHashBandDigests {
  private val NumHashes = 16
  private val Bands = 4
  private val Rows = NumHashes / Bands

  /** One pass: per shingle, 16 seeded md5s; running lexicographic min each;
    * then one md5 per band over the joined mins. Hex strings compare exactly
    * like the engine-level min over md5() outputs.
    */
  def compute(shingles: ArrayData): ArrayData = {
    val mins = new Array[String](NumHashes)
    var i = 0
    val n = shingles.numElements()
    while (i < n) {
      val s = shingles.getUTF8String(i).toString
      var k = 0
      while (k < NumHashes) {
        val h = DigestUtils.md5Hex(k + ":" + s)
        if (mins(k) == null || h.compareTo(mins(k)) < 0) mins(k) = h
        k += 1
      }
      i += 1
    }
    val bands = new Array[Any](Bands)
    var b = 0
    while (b < Bands) {
      val sb = new java.lang.StringBuilder(Rows * 33)
      var r = 0
      while (r < Rows) {
        if (r > 0) sb.append('|')
        sb.append(mins(b * Rows + r))
        r += 1
      }
      bands(b) = UTF8String.fromString(DigestUtils.md5Hex(sb.toString))
      b += 1
    }
    new GenericArrayData(bands)
  }
}
