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
