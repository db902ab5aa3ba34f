package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_nearest_centroid(v, centroids)`: index of the squared-L2-nearest
  * centroid (ties to the LOWEST index — callers keep the centroid array
  * sorted by cluster id, so this is `ORDER BY d2, cluster LIMIT 1`) plus
  * the winning distance, in one codegen'd pass.
  *
  * This is the map side of Lloyd's iteration at scale: each row computes
  * its own argmin against a broadcast centroid array — k*dim work per row,
  * ZERO row inflation. The alternative (explode k candidate rows per
  * vector, shuffle, per-vector min) multiplies the corpus by k and shuffles
  * it every iteration; this expression keeps the only k-means shuffle the
  * tiny cluster-keyed centroid update. Strictly sequential double math so
  * the DuckDB oracle (an explicit explode/row_number formulation) matches
  * bit-for-bit after round(4).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = NearestCentroid.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid expects (array<double>, array<array<double>>), " +
          s"got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(v: Any, cents: Any): Any =
    NearestCentroid.compute(v.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.expressions.NearestCentroid$$.MODULE$$.compute($v, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  val schema: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("d2", DoubleType, nullable = false)))

  def compute(v: ArrayData, cents: ArrayData): GenericInternalRow = {
    val dim = v.numElements()
    var bestIdx = 0
    var bestD2 = Double.PositiveInfinity
    var ci = 0
    while (ci < cents.numElements()) {
      val c = cents.getArray(ci)
      val n = math.min(dim, c.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = v.getDouble(i) - c.getDouble(i)
        acc += d * d
        i += 1
      }
      if (acc < bestD2) { bestD2 = acc; bestIdx = ci } // strict: ties keep low
      ci += 1
    }
    new GenericInternalRow(Array[Any](bestIdx, bestD2))
  }
}
