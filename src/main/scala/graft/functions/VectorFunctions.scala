package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, expression-only.
  *
  * All arithmetic is done in DOUBLE with strictly sequential (index-order)
  * accumulation via `aggregate(zip_with(...))` — the same order the DuckDB
  * oracle uses — so results are bit-reproducible across engines. No UDFs:
  * the whole dot product stays inside whole-stage codegen.
  *
  * Scale notes: these are per-row scalar expressions, embarrassingly
  * parallel. The operators built on top (SimilarityPipeline) are responsible
  * for never materializing an all-pairs product: top-k uses TakeOrdered
  * (per-partition top-k then a k-row driver merge), near-dup uses LSH
  * bucketing, IVF probes a cluster subset.
  */
object VectorFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-order dot product in double precision — the native codegen'd
    * [[graft.expressions.DotProduct]] (registered by the pipelines /
    * GraftExtensions). Bit-identical to the HOF formulation below.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotNative(a, b)

  /** HOF reference formulation of [[dot]] (kept as the semantics spec the
    * native expression is tested against).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign bit of `v . hyperplane` — one random-hyperplane LSH bit
    * (Charikar, STOC'02 §3: P[bits agree] = 1 - angle/pi).
    */
  def hyperplaneBit(v: Column, hyperplane: Column): Column =
    when(dot(v, hyperplane) > 0, lit(1)).otherwise(lit(0))
}
