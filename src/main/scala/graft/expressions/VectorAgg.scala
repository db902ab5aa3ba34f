package graft.expressions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf}

/** `graft_vec_sum(array<double>)`: element-wise sum of dense vectors — the
  * aggregation half of a centroid build (`centroid = vec_sum(v) / count`).
  *
  * Replaces the posexplode formulation (64x row inflation + re-aggregation
  * by (label, pos) + collect_list/array_sort re-assembly) with ONE
  * aggregation keyed by the group column: constant-width buffer per group,
  * map-side partial sums, no inflation — at 10^9 vectors the shuffle
  * carries #groups x dim doubles instead of 64x the table. Numerically
  * identical to `avg` per position after the divide: same partial-sum /
  * merge mechanics, index-wise adds.
  */
object VecSumAgg extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {

  override def zero: Array[Double] = Array.emptyDoubleArray

  /** Element-wise add, GROWING the accumulator to the longer length — a
    * short (corrupt) first vector must not silently truncate every
    * subsequent one (the posexplode/avg formulation this replaces averaged
    * whatever existed at each position).
    */
  private def addInto(acc: Array[Double], v: Seq[Double]): Array[Double] = {
    if (acc.isEmpty) return v.toArray
    val out =
      if (v.length <= acc.length) acc
      else java.util.Arrays.copyOf(acc, v.length)
    var i = 0
    val n = v.length
    while (i < n) { out(i) += v(i); i += 1 }
    out
  }

  override def reduce(b: Array[Double], a: Seq[Double]): Array[Double] =
    addInto(b, a)

  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    if (x.isEmpty) y else addInto(x, y.toSeq)

  override def finish(r: Array[Double]): Seq[Double] = r.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()

  /** Idempotently register as a UDAF on the session. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("graft_vec_sum",
      udaf(VecSumAgg, ExpressionEncoder[Seq[Double]]()))

  def vecSum(v: Column): Column = call_function("graft_vec_sum", v)
}
