package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Cross-document exact substring deduplication — the span-level dedup of
  * Lee et al., "Deduplicating Training Data Makes Language Models Better"
  * (ACL'22). Where the document-level family (dedup_exact/minhash/simhash)
  * drops WHOLE near-duplicate documents and boilerplate_ngrams FLAGS
  * docs by common-shingle fraction, this operator locates the duplicated
  * token SPANS themselves — the licenses, navigation chrome, and quoted
  * passages that recur across otherwise-distinct documents — and produces
  * the span-removed corpus.
  *
  * Reference corpus op this generalizes: the reference engine's health
  * pipeline has no substring dedup; this is part of the LLM-training-data
  * surface (SURVEY §"beyond the reference").
  *
  * Algorithm (token-level, fixed window L): every length-L token shingle
  * is keyed by the md5 of its space-joined tokens; a shingle whose hash
  * occurs in MORE THAN ONE document is duplicated, and a document's
  * duplicated positions are the union of its duplicated shingles'
  * [start, start+L) windows — merged into maximal spans via
  * gaps-and-islands (same-length intervals merge iff consecutive starts
  * differ by at most L, so a single lag comparison suffices; no running
  * max needed). Within-document repetition is deliberately NOT counted
  * (that is [[TextPipeline.repetitionStats]]'s Gopher axis); the
  * cross-document test is `min(doc_id) != max(doc_id)` per hash — a
  * two-long aggregate that is skew-proof where `countDistinct` is not
  * (the all-same-token shingle produces one huge group either way; min/max
  * partial-aggregates map-side).
  *
  * Scale shape: ONE tokenize pass; shingling is a higher-order
  * `transform` over the token array (no per-token explode-then-window);
  * the hash aggregate and the occurrence join are keyed equi-joins
  * (AQE handles hot hashes); the island windows partition by doc_id —
  * doc-bounded, never corpus-bounded. At 100 TB nothing here sees more
  * than a document's tokens in one task except the keyed shuffles.
  *
  * Oracle replay: md5 over space-joined token slices, BIGINT positions —
  * both engines compute identical hashes, starts, and islands.
  */
object SubstringDedup {

  /** Shingle length: spans shorter than L tokens are never flagged. The
    * reference-free default of 8 suits the short synthetic documents;
    * production corpora use ~50 (Lee et al.).
    */
  val SpanLen = 8

  private def docs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)

  /** (doc_id, start, h): every length-L shingle of every document, keyed
    * by content hash. Starts are 0-based BIGINTs (DuckDB `range`
    * parity).
    */
  private[operators] def shingleOccurrences(corpus: DataFrame, len: Int)
      : DataFrame = {
    // round 16 (§1.2 per-task work): the interpreted
    // transform(sequence, md5(concat_ws(slice))) chain allocated a slice
    // array + joined string + hex per window; the native
    // graft_shingle_hashes streams each window's token bytes straight
    // into one digest — bit-identical hashes (spec-pinned), position =
    // array index (the previous sequence start)
    graft.expressions.VectorExpressions.register(corpus.sparkSession)
    corpus
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= len)
      .select(col("doc_id"), posexplode(graft.expressions.VectorExpressions
        .shingleHashesNative(col("toks"), len)).as(Seq("start", "h")))
      .select(col("doc_id"), col("start").cast("long").as("start"),
        col("h"))
  }

  /** Maximal cross-document duplicated spans per document:
    * (doc_id, span_start, span_end, span_len), span_end exclusive,
    * ordered by (doc_id, span_start).
    */
  def dupSpans(spark: SparkSession, sfDir: String): DataFrame =
    dupSpansFrom(docs(spark, sfDir), SpanLen)

  def dupSpansFrom(corpus: DataFrame, len: Int): DataFrame = {
    val sp = spansFrom(corpus, len)
    sp.select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_len"))
      .orderBy("doc_id", "span_start")
  }

  /** The unordered span frame (doc_id, span_start, span_end) — shared by
    * [[dupSpansFrom]] and [[substringDedupFrom]].
    */
  private def spansFrom(corpus: DataFrame, len: Int): DataFrame = {
    val occ = shingleOccurrences(corpus, len)
    // cross-document test per hash: two longs, map-side combined —
    // skew-proof where a distinct-count would not be
    val dup = occ.groupBy("h")
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("h")
    val starts = occ.join(dup, Seq("h")).select("doc_id", "start")
    // gaps-and-islands over fixed-length intervals: a new island starts
    // when the gap between consecutive starts exceeds L (doc-bounded
    // windows — partitioned by doc_id)
    val w = Window.partitionBy("doc_id").orderBy("start")
    starts
      .withColumn("brk",
        when(col("start") - lag(col("start"), 1).over(w) > len, 1L)
          .otherwise(lit(0L)))
      .withColumn("island", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min(col("start")).as("span_start"),
        (max(col("start")) + len).as("span_end"))
  }

  /** Train→eval n-gram overlap report — the QUANTITATIVE companion to
    * [[TextPipeline.decontaminate]]'s binary flag (the GPT-3-appendix
    * contamination measurement): for every eval document (odd doc_id,
    * the decontaminate convention), the fraction of its length-L token
    * shingles that appear anywhere in the train split (even doc_id).
    * `contaminated` flags docs at >= 20% overlap; the fraction column
    * lets callers pick their own bar.
    *
    * Scale shape: the train side collapses to DISTINCT shingle hashes
    * (map-side combined), the eval side LEFT-SEMI-joins it per
    * occurrence — deliberately NOT decontaminate's collect_set
    * tag-and-split, because a boilerplate 8-gram can sit in half the
    * eval corpus and a per-hash set of (doc, start) pairs has no skew
    * bound; the semi-join shuffles keyed by hash and AQE skew-splits
    * hot hashes. Two pruned text scans (shingle pass + per-doc totals),
    * both bounded.
    */
  def overlapReport(spark: SparkSession, sfDir: String): DataFrame =
    overlapReportFrom(docs(spark, sfDir), SpanLen)

  def overlapReportFrom(corpus: DataFrame, len: Int): DataFrame = {
    val occ = shingleOccurrences(corpus, len)
    val trainH = occ.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select("h").distinct()
    val hits = occ.filter(pmod(col("doc_id"), lit(2)) === 1)
      .join(trainH, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    val totals = corpus
      .filter(pmod(col("doc_id"), lit(2)) === 1)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= len)
      .select(col("doc_id"),
        (size(col("toks")) - (len - 1)).cast("long").as("n_grams"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_grams"), 4).as("overlap_frac"),
        (coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_grams") >= 0.2).as("contaminated"))
      .orderBy("doc_id")
  }

  /** The APPLY side — the span-removed corpus, digest-proven: per
    * document, total/kept token counts, the duplicated fraction, and the
    * md5 of the space-joined KEPT tokens (so the cleaned content is
    * verified without shipping text). Documents with no duplicated span
    * keep everything (dup_frac 0.0, digest of the original tokens).
    */
  def substringDedup(spark: SparkSession, sfDir: String): DataFrame =
    substringDedupFrom(docs(spark, sfDir), SpanLen)

  def substringDedupFrom(corpus: DataFrame, len: Int): DataFrame = {
    val base = corpus
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // covered token positions, exploded from the merged spans — output-
    // sized (sum of span lengths, bounded by corpus tokens), keyed by doc
    val covered = spansFrom(corpus, len)
      .select(col("doc_id"),
        explode(sequence(col("span_start"), col("span_end") - 1))
          .as("pos"))
    // positions frame -> anti-join covered -> kept tokens in order
    val kept = base
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "token")))
      .withColumn("pos", col("pos").cast("long"))
      .join(covered, Seq("doc_id", "pos"), "left_anti")
    val keptAgg = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"),
            col("token")))), s => s.getField("token"))))
          .as("kept_digest"))
    base.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round((col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .cast("double") / col("n_tokens"), 4).as("dup_frac"),
        coalesce(col("kept_digest"), md5(lit(""))).as("kept_digest"))
      .orderBy("doc_id")
  }
}
