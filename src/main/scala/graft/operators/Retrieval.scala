package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Inverted-index retrieval over the `documents` table: the classic
  * web-search/RAG workload a training-data engine feeds (build postings,
  * score a term query with TF-IDF).
  *
  * Scale design (100 TB):
  *  - The index is DOCUMENT-PARTITIONED (`shard = doc_id % nShards`) — the
  *    production web-search layout: each shard's postings are built from its
  *    own document partition, so index build is a (term, shard)-keyed
  *    aggregation with map-side combine and NO global per-term collect. A
  *    stopword's postings split across all shards instead of funneling one
  *    task (the skew that kills term-partitioned layouts at corpus scale).
  *  - Per-shard posting lists are doc_id-sorted arrays — a lookup
  *    merge-scans `nShards` sorted runs, and delta indexing appends new
  *    shards without rewriting old ones (the PersistedIndex discipline).
  *  - Term statistics (df, cf) are a second, vocabulary-sized aggregation
  *    over the shard rows — they never touch corpus-sized data again.
  *  - Query scoring reads only the postings of the query's terms: a
  *    selective `isin` filter BEFORE any shuffle, so the corpus-sized
  *    exchange carries query-term rows only; df and N are tiny broadcasts.
  */
object Retrieval {

  /** Postings below this document frequency are dropped from the reported
    * index (noise terms; keeps the oracle-compared output bounded). */
  private val MinDf = 20L

  private val NShards = 8

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** Document-partitioned inverted index: one row per (term, shard) with
    * doc_id-sorted postings (parallel `doc_ids`/`tfs` arrays), plus the
    * term's global df/cf replicated on each shard row for scoring.
    */
  def invertedIndex(spark: SparkSession, sfDir: String): DataFrame =
    invertedIndexFrom(spark, docs(spark, sfDir))

  /** The raw (term, shard) posting rows of [[invertedIndexFrom]] — also
    * the unit a persisted text index stores and appends
    * ([[PersistedIndex.buildTextIndex]]).
    */
  private[operators] def postingsFrom(corpus: DataFrame): DataFrame = {
    val tf = corpus
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf
      .withColumn("shard", pmod(col("doc_id"), lit(NShards)).cast(IntegerType))
      .groupBy(col("term"), col("shard"))
      .agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("tf")).cast(LongType).as("n_occ"),
        sort_array(collect_list(struct(col("doc_id"), col("tf")))).as("p"))
      .select(col("term"), col("shard"), col("n_docs"), col("n_occ"),
        transform(col("p"), x => x.getField("doc_id")).as("doc_ids"),
        transform(col("p"), x => x.getField("tf").cast(LongType)).as("tfs"))
  }

  /** Driver-facing form of [[invertedIndex]]: identical rows, but the
    * postings arrays serialized to comma-joined strings (the
    * `embQuantizeFlat` discipline — harness row-sorters cannot order
    * array cells; library callers keep [[invertedIndexFrom]]'s arrays).
    */
  def invertedIndexFlat(spark: SparkSession, sfDir: String): DataFrame =
    invertedIndex(spark, sfDir)
      .withColumn("doc_ids", array_join(col("doc_ids"), ","))
      .withColumn("tfs", array_join(col("tfs"), ","))

  /** [[invertedIndex]] over any (doc_id, text) frame. */
  def invertedIndexFrom(spark: SparkSession, corpus: DataFrame): DataFrame = {
    val postings = postingsFrom(corpus)
    // global term stats as a window over the (term, shard) rows — at most
    // nShards rows per term, so the per-term partition is bounded at any
    // corpus size (no join, no second corpus lineage)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    postings
      .withColumn("df", sum(col("n_docs")).over(w).cast(LongType))
      .withColumn("cf", sum(col("n_occ")).over(w).cast(LongType))
      .filter(col("df") >= MinDf)
      .select(col("term"), col("shard"), col("df"), col("cf"),
        col("n_docs"), col("doc_ids"), col("tfs"))
      .orderBy("term", "shard")
  }

  /** Demo query-term panel — present in the synthetic corpus vocabulary. */
  private[graft] val QueryTerms = Seq("spark", "join", "window")

  /** TF-IDF top-k retrieval for a fixed term query: score(doc) =
    * sum over matched terms of tf * ln(N / df); top `k` by
    * (score desc, doc_id). The corpus scan is filtered to the query's
    * terms BEFORE the tf aggregation, so the only corpus-sized exchange
    * carries query-term tokens only; df and the 1-row N normalizer are
    * broadcasts, and the final top-k is a TakeOrdered (no global sort).
    */
  def indexTopK(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame =
    indexTopKFrom(spark, docs(spark, sfDir), QueryTerms, k)

  /** [[indexTopK]] over any (doc_id, text) frame and term set. */
  def indexTopKFrom(spark: SparkSession, corpus: DataFrame,
      terms: Seq[String], k: Int): DataFrame = {
    val tf = corpus
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTerm = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val n = corpus.agg(count(lit(1)).as("n_corpus"))
    tf.join(broadcast(dfTerm), "term")
      .crossJoin(broadcast(n))
      .withColumn("w", col("tf").cast(DoubleType) *
        log(col("n_corpus").cast(DoubleType) / col("df")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_terms_hit"),
        round(sum(col("w")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
