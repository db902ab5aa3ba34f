package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the similarity pipeline's ingest-side steps. */
object StreamingSimilarity {

  /** Assign streaming embeddings to a STATIC centroid table — the ingest
    * twin of the kmeans assignment step (a production ANN pipeline
    * classifies each arriving vector into its IVF posting list before
    * writing it). The centroid table is collapsed to a 1-row broadcast
    * bundle (ids + vectors sorted by cluster id) and each row runs the
    * native nearest-centroid argmin: stateless stream-static broadcast
    * join, no watermark, no shuffle of the stream at any rate.
    *
    * Input stream needs (vec_id, v: array<double>); output appends
    * (cluster, d2). Batch/stream equivalence is exact (the argmin is
    * deterministic), spec-proven in StreamingTextSpec's similarity twin.
    */
  def assignStream(vecs: DataFrame, cents: DataFrame): DataFrame = {
    graft.expressions.VectorExpressions.register(vecs.sparkSession)
    val bundle = cents
      .groupBy()
      .agg(array_sort(collect_list(struct(col("cluster"), col("c")))).as("cs"))
      .select(transform(col("cs"), x => x.getField("cluster")).as("ids"),
        transform(col("cs"), x => x.getField("c")).as("centroids"))
    vecs
      .crossJoin(broadcast(bundle))
      .select(col("vec_id"), col("v"), col("ids"),
        inline(array(graft.expressions.VectorExpressions
          .nearestCentroidNative(col("v"), col("centroids")))))
      .select(col("vec_id"), col("v"),
        element_at(col("ids"), col("idx") + 1).as("cluster"), col("d2"))
  }

  /** Streaming twin of
    * [[graft.operators.SimilarityPipeline.pairAlignment]] — the
    * ingest-side CLIP-score gate: each arriving (doc_id, text) document
    * folds its own hash-trick vector IN-EXPRESSION (dense 64-long
    * counts, the [[graft.operators.TextPipeline.textHashEmbedRowwise]]
    * recipe), joins the STATIC embedding table on id, and scores the
    * pair with the batch query's exact arithmetic: per-bucket dot terms
    * micro-quantized then integer-summed (zero buckets contribute
    * floor(0.5·10⁻⁶)=0, so summing all 64 equals the batch's
    * nonzero-only sum), integer text norm, storage-order embedding-norm
    * fold. Stateless stream-static equi-join — no watermark, no state,
    * per-row cost independent of stream rate; batch/stream row equality
    * is spec-proven.
    */
  def alignmentStream(docs: DataFrame, embStatic: DataFrame): DataFrame = {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    val dense = docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        aggregate(
          transform(col("toks"),
            t => graft.operators.TextPipeline.hashEmbedEntry(t)),
          array_repeat(lit(0L), 64),
          (acc, e) => zip_with(acc,
            sequence(lit(0L), lit(63L)),
            (x, i) => when(i === e.getField("pos"),
              x + e.getField("sgn")).otherwise(x))).as("dense"))
    val ev = embStatic
      .select(col("vec_id").as("doc_id"),
        col("embedding").cast("array<double>").as("e"))
    dense.join(ev, "doc_id")
      .select(col("doc_id"),
        aggregate(col("dense"), lit(0L),
          (a, x) => a + when(x =!= 0L, lit(1L)).otherwise(lit(0L)))
          .as("n_terms"),
        aggregate(zip_with(col("dense"), col("e"),
          (v, e) => floor(v.cast("double") * e * 1000000d + 0.5d)
            .cast("long")), lit(0L), (a, x) => a + x).as("dot_micro"),
        aggregate(col("dense"), lit(0L), (a, x) => a + x * x).as("n2t"),
        aggregate(col("e"), lit(0.0), (a, x) => a + x * x).as("n2e"))
      .filter(col("n_terms") > 0L)
      // the batch operator's explicit floor(x*1e4+0.5)/1e4 half-up
      // quantize (round(,4) can flip 1 ulp vs DuckDB on exact
      // half-points) — twin equality is value equality, so the op
      // sequence must match pairAlignment's exactly
      .withColumn("align",
        floor((col("dot_micro").cast("double") / 1000000d)
          / (sqrt(col("n2t").cast("double")) * sqrt(col("n2e")))
          * 10000d + 0.5d) / 10000d)
      .select(col("doc_id"), col("n_terms"), col("align"),
        (col("align") >= 0.0).as("aligned"))
  }
}
