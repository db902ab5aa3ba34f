package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hyperplane_bands(embedding, normals)`: all 4 random-hyperplane LSH band
  * values (Charikar, STOC'02) in ONE pass over the embedding.
  *
  * `normals` is the h_idx-ordered `array<array<double>>` of the 16
  * hyperplane vectors (a 1-row broadcast side); band b's value packs the
  * sign bits of dot(embedding, normals[b*4 + j]) as bit j — identical math
  * to the (vec x hyperplane) grid formulation it replaces (dot > 0 => 1,
  * weighted 2^(h_idx % 4), summed per band; the DuckDB oracle computes the
  * same). The native version exists because the grid shape inflates the
  * table 16x and re-aggregates by (vec_id, band) — an exchange whose only
  * purpose is to undo the inflation. Here the 16 dot products happen in a
  * tight loop per row and the operator is a stateless projection.
  *
  * Dot products accumulate left-to-right in double, matching [[DotProduct]]
  * and the engine-wide float policy (embeddings cast to array<double> at
  * the call site).
  */
case class HyperplaneBands(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_bands expects (array<double>, array<array<double>>), " +
          s"got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(e: Any, n: Any): Any =
    HyperplaneBands.computeBands(
      e.asInstanceOf[ArrayData], n.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, n) =>
      s"${ev.value} = graft.expressions.HyperplaneBands$$.MODULE$$.computeBands($e, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneBands =
    copy(left = newLeft, right = newRight)
}

object HyperplaneBands {
  /** Codegen entry point (static shape for Janino). A normals array shorter
    * than 16 (tiny/sparse corpus) contributes 0-bits for the missing
    * hyperplanes instead of crashing — matching the grid formulation this
    * replaces, which simply produced fewer bit rows.
    */
  def computeBands(emb: ArrayData, normals: ArrayData): GenericArrayData = {
    val have = normals.numElements()
    val vals = new Array[Any](4)
    var b = 0
    while (b < 4) {
      var v = 0L
      var j = 0
      while (j < 4 && b * 4 + j < have) {
        val h = normals.getArray(b * 4 + j)
        val m = math.min(emb.numElements(), h.numElements())
        var acc = 0.0
        var i = 0
        while (i < m) { acc += emb.getDouble(i) * h.getDouble(i); i += 1 }
        if (acc > 0) v |= (1L << j)
        j += 1
      }
      vals(b) = v
      b += 1
    }
    new GenericArrayData(vals)
  }
}
