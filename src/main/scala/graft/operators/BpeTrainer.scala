package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Byte-pair-encoding merge learning (Sennrich et al., ACL'16) — the
  * tokenizer-training step of an LLM data pipeline, Spark-first.
  *
  * Scale shape is the important part: the corpus is scanned EXACTLY ONCE
  * (the word-frequency aggregation); every merge round after that iterates
  * over the VOCAB table (words x frequencies), which is orders of magnitude
  * smaller than the corpus and independent of corpus growth — the same
  * working-set collapse production BPE trainers rely on. Rounds follow the
  * connectedComponents loop discipline: `localCheckpoint` keeps lineage
  * linear, and the only driver traffic per round is the single best-pair
  * row (the same 1-row envelope as CC's fixpoint aggregate).
  *
  * Determinism: the best pair breaks ties by (count DESC, sym_a ASC,
  * sym_b ASC); merging replaces left-to-right non-overlapping occurrences
  * (the standard BPE rule), so the learned merge sequence is unique for a
  * given corpus regardless of partitioning.
  */
object BpeTrainer {

  /** Learn `nMerges` merges over the `documents` table; returns one row per
    * learned merge: (round, sym_a, sym_b, merged, pair_count).
    */
  def bpeMerges(spark: SparkSession, sfDir: String,
      nMerges: Int = 10): DataFrame =
    bpeMergesFrom(spark, Tables.documents(spark, sfDir), nMerges)

  /** [[bpeMerges]] over any frame with a `text` column. */
  def bpeMergesFrom(spark: SparkSession, corpus: DataFrame,
      nMerges: Int = 10): DataFrame = {
    import spark.implicits._
    // THE one corpus pass: whitespace words -> frequencies
    val vocab = corpus
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    // initial symbol sequences: one character per symbol
    var syms = vocab
      .select(col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint()

    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      // adjacent symbol pairs weighted by word frequency; slice is cheap —
      // the frame is vocab-sized
      val pairs = syms
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
          slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))
        .select(col("freq"), explode(arrays_zip(col("l"), col("r"))).as("p"))
        .select(col("p.l").as("sym_a"), col("p.r").as("sym_b"), col("freq"))
        .groupBy(col("sym_a"), col("sym_b"))
        .agg(sum(col("freq")).as("pair_count"))
      // the ONLY driver traffic per round: the single best-pair row
      val best = pairs
        .orderBy(col("pair_count").desc, col("sym_a"), col("sym_b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case None => exhausted = true
        case Some((a, b, cnt)) =>
          learned += ((round, a, b, a + b, cnt))
          // left-to-right non-overlapping replacement of (a, b) -> ab via a
          // sequential array fold — per word, vocab-sized stage
          syms = syms
            .select(col("freq"), mergePair(col("syms"), a, b).as("syms"))
            .localCheckpoint()
          round += 1
      }
    }
    learned.toSeq
      .toDF("round", "sym_a", "sym_b", "merged", "pair_count")
      .withColumn("round", col("round").cast(LongType))
      .orderBy("round")
  }

  /** Greedy left-to-right merge of adjacent (a, b) into a+b within a symbol
    * array: fold each symbol onto the accumulator, replacing the
    * accumulator's tail when it is `a` and the incoming symbol is `b`
    * (after a merge the new symbol participates as the left side of later
    * pairs in the SAME pass only via its merged form — the standard
    * non-overlapping rule).
    */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms,
      array().cast(ArrayType(StringType)),
      (acc, x) =>
        when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Encode the corpus's words with a learned merge table — the apply side
    * (the trained tokenizer in action): replay the merges in order over
    * each word, emit (word, encoded symbols, n_symbols). The merge table is
    * rows-of-merges small, so the replay composes as a fixed expression
    * chain; the corpus encodes in one scan-parallel pass.
    */
  def bpeEncode(spark: SparkSession, corpus: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val encoded = merges.foldLeft(split(col("word"), "").as("syms")) {
      case (arr, (a, b)) => mergePair(arr, a, b).as("syms")
    }
    corpus
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      // materialize the merge-chain ONCE per word (a second direct
      // reference would re-inline the whole fold chain — the documented
      // Catalyst pitfall)
      .select(col("word"), encoded)
      .select(col("word"), col("syms"),
        size(col("syms")).cast(LongType).as("n_symbols"))
      .orderBy("word")
  }
}
