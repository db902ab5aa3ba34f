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
}
