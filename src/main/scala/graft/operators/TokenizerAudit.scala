package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens
import graft.sources.Tables

/** Cross-family tokenizer audits — the invariants the token accountants
  * ([[BpeTrainer.bpeTokenCount]] pricing joins,
  * [[UnigramTrainer.tokenBudgetSampleUnigram]]) silently rely on, turned
  * into measured driver rows.
  */
object TokenizerAudit {

  /** Round-trip audit over ALL THREE frozen tokenizers: per family, over the
    * corpus's distinct words, how many words get a segmentation at all
    * (`n_priced` — the accountants' inner-join contract), how many
    * segmentations concatenate back to the word exactly
    * (`n_roundtrip` — decode(encode(w)) == w, the lossless invariant),
    * and the unsegmentable remainder counted and named
    * (`first_unsegmentable`, '' when none).
    *
    *  - BPE ([[BpeTrainer.FrozenMerges]]) starts from characters and
    *    only ever merges, so every word is priced and losslessness is
    *    structural — this row MEASURES it (n_priced = n_roundtrip =
    *    n_words) rather than assuming it.
    *  - Unigram ([[UnigramTrainer.FrozenVocab]]) drops words containing
    *    characters outside the released vocab's alphabet — the
    *    documented no-row contract; the remainder is what this audit
    *    surfaces.
    *  - WordPiece ([[WordPieceTrainer.FrozenPieces]]) segments by greedy
    *    longest match; a position with no matching piece (an unseen
    *    character) makes the word unsegmentable — same no-row contract,
    *    same surfaced remainder.
    *
    * Scale shape: one corpus pass to distinct words per family (the
    * bpeWordSymbols / unigramWordSymbols shape), per-word pure-function
    * encoding, then a single 1-row aggregate each — the only collected
    * value is `first_unsegmentable`, a bounded `min`.
    */
  def tokenizerRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Tables.documents(spark, sfDir)
    import spark.implicits._
    val bpe = BpeTrainer.bpeWordSymbols(corpus, BpeTrainer.FrozenMerges)
      .agg(count(lit(1)).as("n_words"),
        count(lit(1)).as("n_priced"),
        sum((array_join(col("syms"), "") === col("word")).cast("long"))
          .as("n_roundtrip"))
      .select(lit("bpe").as("tokenizer"), col("n_words"), col("n_priced"),
        col("n_roundtrip"), lit(0L).as("n_unsegmentable"),
        lit("").as("first_unsegmentable"))
    val lp = UnigramTrainer.FrozenVocab.toMap
    val uni = corpus
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .as[String]
      .map { w =>
        val seg = UnigramTrainer.viterbi(w, lp)
        (w, seg.nonEmpty, seg.nonEmpty && seg.mkString("") == w)
      }
      .toDF("word", "priced", "ok")
      .agg(count(lit(1)).as("n_words"),
        sum(col("priced").cast("long")).as("n_priced"),
        sum(col("ok").cast("long")).as("n_roundtrip"),
        sum((!col("priced")).cast("long")).as("n_unsegmentable"),
        coalesce(min(when(!col("priced"), col("word"))), lit(""))
          .as("first_unsegmentable"))
      .select(lit("unigram").as("tokenizer"), col("n_words"),
        col("n_priced"), col("n_roundtrip"), col("n_unsegmentable"),
        col("first_unsegmentable"))
    val wpPieces = WordPieceTrainer.FrozenPieces.toSet
    val wp = corpus
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .as[String]
      .map { w =>
        val seg = WordPieceTrainer.greedyEncode(w, wpPieces)
        val recon = seg
          .map(s => if (s.startsWith("##")) s.substring(2) else s)
          .mkString("")
        (w, seg.nonEmpty, seg.nonEmpty && recon == w)
      }
      .toDF("word", "priced", "ok")
      .agg(count(lit(1)).as("n_words"),
        sum(col("priced").cast("long")).as("n_priced"),
        sum(col("ok").cast("long")).as("n_roundtrip"),
        sum((!col("priced")).cast("long")).as("n_unsegmentable"),
        coalesce(min(when(!col("priced"), col("word"))), lit(""))
          .as("first_unsegmentable"))
      .select(lit("wordpiece").as("tokenizer"), col("n_words"),
        col("n_priced"), col("n_roundtrip"), col("n_unsegmentable"),
        col("first_unsegmentable"))
    bpe.unionByName(uni).unionByName(wp).orderBy("tokenizer")
  }

  /** Corpus-weighted fertility accounting per frozen tokenizer family —
    * the numbers a budget planner divides: `n_tokens / n_occurrences` is
    * the fertility (tokens per word) and `n_chars / n_tokens` the
    * compression rate. Emitted as exact integer sums (not ratios), so
    * the surface is all-BIGINT/VARCHAR and engine-identical by
    * construction; unigram rows count only PRICED words (the
    * accountants' inner-join contract — [[tokenizerRoundtrip]] names the
    * remainder).
    *
    * Scale shape: one corpus pass to the (word, freq) frame, per-word
    * pure-function encoding of the DISTINCT words only (freq weights the
    * sums), and a 1-row aggregate per family.
    */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Tables.documents(spark, sfDir)
    import spark.implicits._
    val wf = corpus
      .select(explode(tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val bpe = wf
      .join(BpeTrainer.bpeWordSymbols(corpus, BpeTrainer.FrozenMerges)
        .select(col("word"), size(col("syms")).cast("long").as("n_sym")),
        "word")
      .agg(sum(col("freq")).as("n_occurrences"),
        sum(col("freq") * col("n_sym")).as("n_tokens"),
        sum(col("freq") * length(col("word"))).as("n_chars"))
      .select(lit("bpe").as("tokenizer"), col("n_occurrences"),
        col("n_tokens"), col("n_chars"))
    val lp = UnigramTrainer.FrozenVocab.toMap
    val uni = wf.as[(String, Long)]
      .flatMap { case (w, f) =>
        val seg = UnigramTrainer.viterbi(w, lp)
        if (seg.isEmpty) None
        else Some((f, seg.length.toLong * f, w.length.toLong * f))
      }
      .toDF("occ", "tok", "chr")
      .agg(sum(col("occ")).as("n_occurrences"),
        sum(col("tok")).as("n_tokens"), sum(col("chr")).as("n_chars"))
      .select(lit("unigram").as("tokenizer"), col("n_occurrences"),
        col("n_tokens"), col("n_chars"))
    val wpPieces = WordPieceTrainer.FrozenPieces.toSet
    val wp = wf.as[(String, Long)]
      .flatMap { case (w, f) =>
        val seg = WordPieceTrainer.greedyEncode(w, wpPieces)
        if (seg.isEmpty) None
        else Some((f, seg.length.toLong * f, w.length.toLong * f))
      }
      .toDF("occ", "tok", "chr")
      .agg(sum(col("occ")).as("n_occurrences"),
        sum(col("tok")).as("n_tokens"), sum(col("chr")).as("n_chars"))
      .select(lit("wordpiece").as("tokenizer"), col("n_occurrences"),
        col("n_tokens"), col("n_chars"))
    bpe.unionByName(uni).unionByName(wp).orderBy("tokenizer")
  }
}
