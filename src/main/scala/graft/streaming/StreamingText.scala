package graft.streaming

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Misra-Gries summary state for [[StreamingText.heavyHittersStream]]. */
case class MgSummary(counts: Map[String, Long])

/** Per-source admitted-count state for [[StreamingText.domainCapStream]]. */
case class CapState(admitted: Long)

/** Per-language used-token state for [[StreamingText.tokenBudgetStream]]. */
case class BudgetState(used: Long)

/** Per-(window, language) weighted-reservoir state for
  * [[StreamingText.weightedSampleStream]]: the current k winners as
  * (es_key, doc_id) pairs — bounded at k entries whatever the arrival
  * volume.
  */
case class EsReservoir(entries: Seq[(Double, Long)])

/** Per-digest claimed flag for [[StreamingText.trainingIngestTraceStream]]'s
  * dedup stage (one boolean per distinct gated document digest).
  */
case class SeenDigest(seen: Boolean)

/** Streaming twins of the batch text-analysis operators (TextPipeline) for
  * the ingest side of a training-data pipeline.
  */
object StreamingText extends Logging {

  /** Row shape threaded through [[trainingIngestTraceStream]]'s stages:
    * (doc_id, source, lang, n_tokens, quality_q4, text_hash, skey,
    * outcome-or-null). Object-level so tuple Encoders derive.
    */
  private type TraceRow =
    (Long, String, String, Long, Long, String, String, String)

  /** Streaming vocabulary build — windowed token counts over a document
    * stream, the ingest-side twin of TextPipeline.textVocab. Append-mode
    * windowed aggregation: token counts finalize (and state drops) once the
    * watermark passes each window, so state is bounded by
    * (windows-in-flight x vocab) regardless of stream length. At 100 TB/day
    * the explode fans out on executors and the count is map-side partial.
    */
  def vocabStream(docs: DataFrame, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes"): DataFrame = {
    logInfo(s"streaming vocab, window $windowLen, watermark $delay")
    docs
      .withWatermark(eventTimeCol, delay)
      .select(col(eventTimeCol),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .groupBy(window(col(eventTimeCol), windowLen), col("token"))
      .count()
      .select(col("window.start").as("window_start"), col("token"),
        col("count").as("n"))
  }

  /** Streaming feature-hashed doc vectors — the ingest twin of
    * [[graft.operators.TextPipeline.textHashEmbed]], running the
    * zero-shuffle row-wise form ([[graft.operators.TextPipeline
    * .textHashEmbedRowwise]]): each arriving document folds its own
    * 64-dim signed bag-of-words, normalizes, and emits sparse rows with
    * NO state store and no exchange — text→vector at wire speed, ready
    * for [[StreamingSimilarity.assignStream]] downstream.
    */
  def hashEmbedStream(docs: DataFrame): DataFrame =
    graft.operators.TextPipeline.textHashEmbedRowwise(docs)

  /** Streaming quality gate — per-document quality scoring and filtering on
    * ingest (stateless projection; the streaming twin of
    * TextPipeline.textQuality). Passes every input column through plus the
    * score; drop rows below `minQuality` before they ever hit storage.
    */
  def qualityFilterStream(docs: DataFrame, minQuality: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions._
    val toks = tokens(col("text"))
    val nTokens = size(toks).cast("double")
    val lengthScore = least(lit(1.0), nTokens / 50.0)
    val stopScore = least(lit(1.0),
      stopwordHits(toks, LangProfiles.toMap.apply("en")).cast("double")
        / nTokens * 5.0)
    val diversity = size(array_distinct(toks)).cast("double") / nTokens
    val quality = lengthScore * 0.4 + stopScore * 0.3 + diversity * 0.3
    docs.withColumn("quality", round(quality, 4))
      .filter(col("quality") >= minQuality)
  }

  /** Streaming MODEL-BASED quality gate — the frozen-classifier twin of
    * [[qualityFilterStream]]'s heuristic one and the production shape of
    * [[graft.operators.TextPipeline.qualityClassifier]]'s scorer: the
    * released 4096-bucket linear model rides along as a MAP LITERAL in
    * the plan (weights are bounded by the bucket count, so the "model"
    * is a constant, not a join side), each document scores STATELESSLY
    * via a position-ordered fold over its hashed tokens — the exact
    * batch arithmetic, so stream scores equal the batch scorer's on the
    * same docs (spec-proven) — and rows below `threshold` drop before
    * storage. No state, no watermark, no shuffle: the gate composes
    * anywhere in an ingest plan at any volume.
    */
  def classifierGateStream(docs: DataFrame, weights: Map[Long, Double],
      threshold: Double = 0.0): DataFrame = {
    val ks = weights.keys.toArray.sorted
    // an empty released model scores nothing — a constant-0 map literal
    // would make map_from_arrays choke on empty arrays
    val score =
      if (ks.isEmpty) lit(0.0)
      else {
        val wMap = map_from_arrays(lit(ks), lit(ks.map(weights)))
        val toks = filter(graft.functions.TextFunctions.tokens(col("text")),
          t => length(t) > 0)
        aggregate(
          transform(toks, t => coalesce(
            element_at(wMap,
              conv(substring(md5(t), 1, 3), 16, 10).cast("long")),
            lit(0.0))),
          lit(0.0), (acc, x) => acc + x)
      }
    val toksAll = filter(graft.functions.TextFunctions.tokens(col("text")),
      t => length(t) > 0)
    docs
      // the batch scorer (qualityClassifierFrom) never emits a row for a
      // zero-token document (its posexplode yields no feature rows); the
      // gate must agree, not score such docs 0.0 and pass them whenever
      // threshold < 0
      .filter(size(toksAll) > 0)
      .withColumn("score", round(score, 6))
      .filter(col("score") > threshold)
  }

  /** Attach per-micro-batch ingest telemetry to any document stream via
    * Spark's `observe` API: row / empty-text / oversize counters computed
    * INSIDE the existing stages (no extra pass, no extra sink) and
    * surfaced through every `StreamingQueryProgress.observedMetrics`
    * under the given name — the production "is the crawl healthy right
    * now" dashboard feed, delivered by the engine's own progress events
    * instead of a second aggregation query. Composes anywhere in a
    * stream plan; the metrics are exact per micro-batch.
    */
  def observedIngest(docs: DataFrame,
      name: String = "ingest"): DataFrame =
    docs.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("n_empty"),
      sum(when(length(col("text")) > 100000, 1L).otherwise(0L))
        .as("n_oversize"))

  /** Streaming train/val/test split — the ingest twin of
    * TextPipeline.splitTrain: the SAME seeded content-hash bucket
    * (TextPipeline.hashBucket "split:"), so a document gets an identical
    * split label whether it arrives in a batch backfill or on the stream.
    * Stateless codegen'd projection: no watermark, no state, any rate.
    */
  def splitStream(docs: DataFrame): DataFrame = {
    val bucket = graft.operators.TextPipeline.hashBucket("split:")
    docs
      .withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
          .otherwise("test"))
  }

  /** Streaming mixture sampling — the ingest twin of
    * TextPipeline.mixtureSample: per-source acceptance rates arrive as a
    * static weights table (w_source, accept_pct) broadcast onto the stream
    * (stream-static broadcast join — no shuffle of the stream side), and
    * acceptance is the same seeded "mix:" bucket, so batch and stream admit
    * exactly the same documents.
    */
  def mixtureSampleStream(docs: DataFrame, weights: DataFrame): DataFrame =
    docs
      .join(broadcast(weights), col("source") === col("w_source"))
      .filter(graft.operators.TextPipeline.hashBucket("mix:") <
        col("accept_pct"))
      .drop("w_source")

  /** Windowed streaming heavy hitters — the Misra-Gries one-pass summary
    * the batch operator's scaladoc promises (TextPipeline.heavyHitters is
    * exact two-pass; a stream cannot hold per-token counts for an unbounded
    * vocabulary, so state must be CONSTANT per window). Per event-time
    * window, a `flatMapGroupsWithState` keyed by window start folds tokens
    * into a capacity-`capacity` Misra-Gries summary (hit: +1; miss with
    * room: insert; miss when full: decrement all, drop zeros) and emits the
    * surviving candidates once the watermark closes the window.
    *
    * Guarantee (Misra-Gries'82): every token with true in-window frequency
    * > N/capacity IS in the emitted summary, and each emitted mg_count
    * lower-bounds the true count by at most N/capacity. Candidate counts
    * depend on fold order (arrival), so downstream either re-counts exactly
    * over the candidate set or consumes the superset as-is — the standard
    * sketch contract. State per window is `capacity` entries regardless of
    * stream length or vocabulary.
    */
  def heavyHittersStream(docs: DataFrame, eventTimeCol: String,
      windowMs: Long = 60000L, delayMs: Long = 600000L,
      capacity: Int = 20): DataFrame = {
    import docs.sparkSession.implicits._
    // watermark is declared ON the derived window-start column (projecting
    // `window(...).start` out of a pre-watermarked struct drops the
    // event-time tag, and EventTimeTimeout requires a tagged column to
    // survive into the stateful operator); wstart <= event time, so the
    // delay contract only loosens by the window length
    val toks = docs
      .select(
        window(col(eventTimeCol), s"$windowMs milliseconds")
          .getField("start").as("wstart"),
        col("text"))
      .withWatermark("wstart", s"$delayMs milliseconds")
      .select(col("wstart"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("token"))
      .as[(java.sql.Timestamp, String)]
    toks.groupByKey(_._1)
      .flatMapGroupsWithState[MgSummary, (java.sql.Timestamp, String, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wstart: java.sql.Timestamp, rows: Iterator[(java.sql.Timestamp, String)],
            state: GroupState[MgSummary]) =>
          if (state.hasTimedOut) {
            val out = state.get.counts.toSeq
              .sortBy { case (t, c) => (-c, t) }
              .map { case (t, c) => (wstart, t, c) }
            state.remove()
            out.iterator
          } else {
            val counts = scala.collection.mutable.Map.empty[String, Long]
            state.getOption.foreach(_.counts.foreach { case (t, c) =>
              counts(t) = c
            })
            rows.foreach { case (_, tok) =>
              counts.get(tok) match {
                case Some(c) => counts(tok) = c + 1
                case None if counts.size < capacity => counts(tok) = 1L
                case None => // full: the decrement step
                  counts.mapValuesInPlace((_, c) => c - 1)
                  counts.filterInPlace((_, c) => c > 0)
              }
            }
            state.update(MgSummary(counts.toMap))
            // fire when the watermark passes the window END; the engine
            // then delays the callback by the watermark itself
            state.setTimeoutTimestamp(wstart.getTime + windowMs)
            Iterator.empty
          }
      }
      .toDF("window_start", "token", "mg_count")
  }

  /** Streaming weighted sample — the ingest twin of
    * TextPipeline.weightedSample: per event-time window and language,
    * the k documents with the largest Efraimidis-Spirakis keys u^(1/w)
    * (u deterministic from doc_id, w = n_chars floored at 1 — the SAME
    * [[graft.operators.TextPipeline.esKey]] column as batch). State per
    * (window, lang) is the current k winners — a true bounded reservoir:
    * an arriving document either displaces the smallest key or is
    * dropped, so memory is k pairs per in-flight group regardless of
    * volume. Emission on event-time timeout, ranked, when the watermark
    * passes the window end.
    *
    * Because the keys are pure functions of the document (not of arrival
    * time), the admitted set is ARRIVAL-ORDER-INDEPENDENT: any
    * permutation of the same rows yields the identical sample — a
    * strictly stronger batch/stream contract than the cap/budget twins'
    * ordered-replay equivalence (spec-proven on a reversed replay).
    */
  def weightedSampleStream(docs: DataFrame, eventTimeCol: String,
      windowMs: Long = 60000L, delayMs: Long = 600000L,
      k: Int = 20): DataFrame = {
    import docs.sparkSession.implicits._
    val keyed = docs
      .select(
        window(col(eventTimeCol), s"$windowMs milliseconds")
          .getField("start").as("wstart"),
        col("lang"), col("doc_id"),
        graft.operators.TextPipeline.esKey(col("doc_id"), col("n_chars"))
          .as("es_key"))
      .withWatermark("wstart", s"$delayMs milliseconds")
      .as[(java.sql.Timestamp, String, Long, Double)]
    keyed.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[EsReservoir,
        (java.sql.Timestamp, String, Long, Double, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (java.sql.Timestamp, String),
            rows: Iterator[(java.sql.Timestamp, String, Long, Double)],
            state: GroupState[EsReservoir]) =>
          val (wstart, lang) = key
          if (state.hasTimedOut) {
            val out = state.get.entries
              .sortBy { case (esk, id) => (-esk, id) }
              .zipWithIndex
              .map { case ((esk, id), i) =>
                // HALF_UP to 6 decimals — Spark round()'s semantics, so
                // the emitted column is byte-equal to the batch one
                (wstart, lang, id, BigDecimal(esk)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble, i + 1L) }
            state.remove()
            out.iterator
          } else {
            // merge the batch's arrivals into the k-element reservoir:
            // largest keys win, doc_id breaks ties (the batch ordering)
            val merged = (state.getOption.map(_.entries).getOrElse(Nil)
                ++ rows.map(r => (r._4, r._3)))
              .sortBy { case (esk, id) => (-esk, id) }
              .take(k)
            state.update(EsReservoir(merged))
            state.setTimeoutTimestamp(wstart.getTime + windowMs)
            Iterator.empty
          }
      }
      .toDF("window_start", "lang", "doc_id", "es_key", "rk")
  }

  /** Streaming data-quality monitor — the ingest twin of
    * graft.operators.DataQuality.qualityChecks: per event-time window,
    * count arriving documents and each violation class (empty text,
    * out-of-domain language, out-of-bounds length). Append-mode windowed
    * aggregation, state = one counter row per in-flight window; alert
    * logic downstream filters `n_violations > 0`. Uniqueness is the one
    * check that cannot be windowed statelessly — that is
    * [[graft.streaming.StreamingDedup]]'s job.
    */
  def qualityMonitorStream(docs: DataFrame, eventTimeCol: String,
      windowLen: String = "1 minute", delay: String = "10 minutes",
      langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")): DataFrame =
    docs
      .withWatermark(eventTimeCol, delay)
      .groupBy(window(col(eventTimeCol), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("empty_text"),
        sum(when(!col("lang").isin(langs: _*), 1L).otherwise(0L))
          .as("bad_lang"),
        sum(when(col("n_chars") < 0 || col("n_chars") > 1000000, 1L)
          .otherwise(0L)).as("bad_len"))
      .select(col("window.start").as("window_start"), col("n_docs"),
        col("empty_text"), col("bad_lang"), col("bad_len"),
        (col("empty_text") + col("bad_lang") + col("bad_len"))
          .as("n_violations"))

  /** Streaming per-domain cap — the ingest twin of
    * TextPipeline.domainCap: admit at most `k` documents per source, in
    * arrival order (doc_id-ordered within a micro-batch so replays are
    * deterministic). State per source is ONE long — the admitted count —
    * so state size is #sources regardless of stream length; a source that
    * reached its cap costs a counter read per subsequent row, never
    * buffering. Emits (source, doc_id, rk) in Append mode — each admitted
    * row is emitted exactly once and never revised.
    *
    * Batch/stream agreement: when the stream delivers documents in global
    * doc_id order (a backfill replay), the admitted set and ranks equal
    * the batch operator's exactly (spec-proven); under out-of-order
    * arrival the cap still holds but admission is arrival-order — the
    * standard streaming-cap contract.
    *
    * Scale shape: pass a [[SpentKeys]] and rows of a source whose cap is
    * already spent are dropped MAP-SIDE before the `groupByKey` shuffle —
    * a capped dominant domain stops funneling its whole micro-batch
    * through one task (the set is tiny, one string per spent source, and
    * rides to executors in the task closure each batch). Without it the
    * cap still holds; the rows just shuffle to be drained.
    */
  def domainCapStream(docs: DataFrame, k: Int = 30,
      spent: Option[SpentKeys] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val base = docs.select(col("source"), col("doc_id")).as[(String, Long)]
    val prefiltered = spent.fold(base)(s => base.filter(r => s.admit(r._1)))
    prefiltered
      .groupByKey(_._1)
      .flatMapGroupsWithState[CapState, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long)],
            state: GroupState[CapState]) =>
          val admitted = state.getOption.map(_.admitted).getOrElse(0L)
          val room = (k - admitted).max(0L).toInt
          if (room == 0) {
            rows.foreach(_ => ()) // drain; the cap is already reached
            // re-report every drained arrival: idempotent, and it heals
            // the prefilter set after a checkpoint restart
            spent.foreach(_.report(source))
            Iterator.empty
          } else {
            // one micro-batch's rows for one source; ordered so a replay
            // admits identically
            // NO report on the batch that reaches the cap: this batch's
            // admissions are not yet committed, and a failed+retried batch
            // would otherwise find its rows prefiltered by a spent set
            // that outlived the state rollback. Only the drain branch
            // reports — its exhaustion is read from the previous COMMITTED
            // state version, so it is retry-safe (the set just lags one
            // batch, a missed optimization, never a lost admission).
            val take = rows.map(_._2).toSeq.sorted.take(room)
            state.update(CapState(admitted + take.size))
            take.iterator.zipWithIndex.map { case (docId, i) =>
              (source, docId, admitted + i + 1)
            }
          }
      }
      .toDF("source", "doc_id", "rk")
  }

  /** Streaming token budget — the ingest twin of
    * TextPipeline.tokenBudgetSample: admit documents until each language's
    * running token total reaches `budget`. A document is admitted iff its
    * START offset (tokens used before it) is inside the budget, exactly the
    * batch rule, so a replay in the batch operator's seeded-hash order
    * admits the identical set with identical offsets (spec-proven). State
    * per language is ONE long; within a micro-batch rows order by the same
    * seeded md5 key so replays are deterministic. Emits
    * (lang, doc_id, n_tokens, start_offset) in Append mode — each
    * admitted row is emitted exactly once and never revised.
    *
    * Scale shape: pass a [[SpentKeys]] and rows of a language whose
    * budget is already spent drop MAP-SIDE before the shuffle (see
    * [[domainCapStream]] — same discipline, budget keys are languages).
    */
  def tokenBudgetStream(docs: DataFrame, budget: Long = 2000,
      spent: Option[SpentKeys] = None): DataFrame =
    tokenBudgetStreamCounted(docs, budget, spent,
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))

  /** [[tokenBudgetStream]] denominated in FROZEN-tokenizer tokens — the
    * ingest twin of TextPipeline.tokenBudgetSampleBpe. Each arriving row
    * prices itself through the merge-chain expression
    * ([[graft.operators.BpeTrainer.bpeTokenCount]] — no vocab join on the
    * ingest path); admission state and replay determinism are identical
    * to the whitespace twin, and an ordered replay admits exactly the
    * batch operator's set (spec-proven). Zero-token documents (empty /
    * whitespace-only text) are dropped, matching the batch operator,
    * whose inner vocab join never produces a row for them.
    */
  def tokenBudgetStreamBpe(docs: DataFrame, budget: Long = 2000,
      spent: Option[SpentKeys] = None): DataFrame =
    tokenBudgetStreamCounted(docs, budget, spent,
      graft.operators.BpeTrainer.bpeTokenCount(col("text")),
      dropEmpty = true)

  private def tokenBudgetStreamCounted(docs: DataFrame, budget: Long,
      spent: Option[SpentKeys], countTokens: org.apache.spark.sql.Column,
      dropEmpty: Boolean = false): DataFrame = {
    import docs.sparkSession.implicits._
    val counted = docs
      .select(col("lang"), col("doc_id"),
        countTokens.as("n_tokens"),
        md5(concat(lit("tb:"), col("doc_id"))).as("skey"))
    val base = (if (dropEmpty) counted.filter(col("n_tokens") > 0)
      else counted)
      .as[(String, Long, Long, String)]
    val prefiltered = spent.fold(base)(s => base.filter(r => s.admit(r._1)))
    prefiltered
      .groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState, (String, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[(String, Long, Long, String)],
            state: GroupState[BudgetState]) =>
          var used = state.getOption.map(_.used).getOrElse(0L)
          if (used >= budget) {
            rows.foreach(_ => ()) // budget spent; counter read only
            spent.foreach(_.report(lang)) // heal the prefilter on restart
            Iterator.empty
          } else {
            val out = rows.toSeq.sortBy(r => (r._4, r._2)).flatMap {
              case (_, docId, nTokens, _) =>
                if (used < budget) {
                  val start = used
                  used += nTokens
                  Some((lang, docId, nTokens, start))
                } else None
            }
            // no report here: see domainCapStream — exhaustion reported
            // only from the drain branch, whose state read is committed
            state.update(BudgetState(used))
            out.iterator
          }
      }
      .toDF("lang", "doc_id", "n_tokens", "start_offset")
  }

  /** The COMPOSED streaming ingest program — quality gate -> exact dedup
    * -> per-source cap -> per-language token budget -> train/val/test
    * split, in ONE streaming query (one checkpoint, one state store, one
    * restart domain). This is what a production ingest job actually runs;
    * the single-purpose twins above are its stages exposed for testing
    * and reuse.
    *
    * Stage semantics are EXACTLY the twins': the same quality score and
    * threshold, the same normalized-text digest state,
    * doc_id-ordered cap admission, seeded-hash-ordered budget admission
    * (each within its micro-batch), and the deterministic "split:"
    * content-hash bucket. The cap and budget stages here carry the row
    * payload (lang, n_tokens, cap_rk) through their state functions —
    * the standalone twins emit only their own keys, which is right for a
    * single-stage job but would force a re-join in a composition.
    *
    * State across the whole query: one digest row per distinct document
    * inside the watermark horizon, ONE long per source, ONE long per
    * language — restart-safe via the query checkpoint (spec-proven with
    * a mid-stream stop/start).
    *
    * Scale: the gate and split are stateless projections; dedup is the
    * 1x-text watermark-bounded shuffle; cap/budget shuffle only gate+dedup
    * survivors, keyed by source/language, each holding a counter. The
    * [[SpentKeys]] prefilter discipline applies unchanged if a dominant
    * source/language exhausts its allowance (pass the instances through).
    *
    * Emits one row per fully-admitted document:
    * (lang, source, doc_id, n_tokens, cap_rk, start_offset, bucket, split).
    */
  def trainingIngestStream(docs: DataFrame, eventTimeCol: String,
      minQuality: Double = 0.5, k: Int = 30, budget: Long = 2000,
      delay: String = "10 minutes",
      spentSources: Option[SpentKeys] = None,
      spentLangs: Option[SpentKeys] = None): DataFrame = {
    import docs.sparkSession.implicits._
    val gated = qualityFilterStream(docs, minQuality)
    val deduped = StreamingDedup
      .dedupExactStream(gated, eventTimeCol, delay).drop("text_hash")

    // per-source cap, payload-carrying: (source, doc_id, lang, n_tokens)
    val counted = deduped.select(col("source"), col("doc_id"), col("lang"),
      size(graft.functions.TextFunctions.tokens(col("text"))).cast("long")
        .as("n_tokens"))
      .as[(String, Long, String, Long)]
    val capIn = spentSources.fold(counted)(s => counted.filter(r => s.admit(r._1)))
    val capped = capIn
      .groupByKey(_._1)
      .flatMapGroupsWithState[CapState, (String, Long, String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long, String, Long)],
            state: GroupState[CapState]) =>
          val admitted = state.getOption.map(_.admitted).getOrElse(0L)
          val room = (k - admitted).max(0L).toInt
          if (room == 0) {
            rows.foreach(_ => ())
            spentSources.foreach(_.report(source))
            Iterator.empty
          } else {
            // doc_id order within the batch — the domainCapStream rule
            val take = rows.toSeq.sortBy(_._2).take(room)
            state.update(CapState(admitted + take.size))
            take.iterator.zipWithIndex.map { case ((_, docId, lang, nTok), i) =>
              (source, docId, lang, nTok, admitted + i + 1)
            }
          }
      }
      .toDF("source", "doc_id", "lang", "n_tokens", "cap_rk")

    // per-language budget, payload-carrying; same skey rule as the twin
    val budgetIn = capped.select(col("lang"), col("doc_id"), col("n_tokens"),
      md5(concat(lit("tb:"), col("doc_id"))).as("skey"),
      col("source"), col("cap_rk"))
      .as[(String, Long, Long, String, String, Long)]
    val budgetPre = spentLangs.fold(budgetIn)(s => budgetIn.filter(r => s.admit(r._1)))
    budgetPre
      .groupByKey(_._1)
      .flatMapGroupsWithState[BudgetState,
        (String, String, Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[(String, Long, Long, String, String, Long)],
            state: GroupState[BudgetState]) =>
          var used = state.getOption.map(_.used).getOrElse(0L)
          if (used >= budget) {
            rows.foreach(_ => ())
            spentLangs.foreach(_.report(lang))
            Iterator.empty
          } else {
            val out = rows.toSeq.sortBy(r => (r._4, r._2)).flatMap {
              case (_, docId, nTokens, _, source, capRk) =>
                if (used < budget) {
                  val start = used
                  used += nTokens
                  Some((lang, source, docId, nTokens, capRk, start))
                } else None
            }
            state.update(BudgetState(used))
            out.iterator
          }
      }
      .toDF("lang", "source", "doc_id", "n_tokens", "cap_rk", "start_offset")
      // deterministic content-hash split — the splitStream projection
      .withColumn("bucket", graft.operators.TextPipeline.hashBucket("split:"))
      .withColumn("split",
        when(col("bucket") < 90, "train").when(col("bucket") < 95, "val")
          .otherwise("test"))
  }

  /** The streaming LINEAGE twin of the composed ingest — one output row
    * per ARRIVING document carrying its first-rejecting-stage outcome
    * (`quality_gate`/`dedup_exact`/`domain_cap`/`token_budget`/
    * `admitted`): the batch [[graft.operators.CurationProgram
    * .curationTrace]] contract computed ONLINE, because the stage that
    * drops a document is the only place that knows why. Where
    * [[trainingIngestStream]] emits only admissions (the training-set
    * feed), this emits the full audit feed — the two run side by side in
    * production (same stage rules, same state semantics), or this one
    * alone when the manifest is derived by filtering `outcome =
    * 'admitted'`.
    *
    * Stage rules are EXACTLY the composed stream's: the rounded quality
    * bar; first-gated-arrival-wins digest dedup (rows already rejected
    * pass through WITHOUT claiming the digest — batch dedup competes
    * among gated docs only); doc_id-ordered cap admission per source;
    * seeded-hash-ordered budget admission per language, where rejection
    * is absorbing (the batch running sum is monotone, so once a
    * language's budget is crossed every later doc is out — `used` stops
    * advancing, exactly like the batch `start_offset < budget` rule).
    * On a one-batch ordered replay the output EQUALS the batch
    * curationTrace row-for-row; counters and digest state survive a
    * checkpoint restart (both spec-proven, CurationTraceStreamSpec).
    *
    * State: one [[SeenDigest]] per distinct gated digest, one counter
    * per source, one per language — identical to the composed ingest
    * (this twin adds no state class of its own beyond the digest flag;
    * the admission twins share [[CapState]]/[[BudgetState]]).
    */
  def trainingIngestTraceStream(docs: DataFrame, minQuality: Double = 0.5,
      k: Int = 30, budget: Long = 2000): DataFrame = {
    import docs.sparkSession.implicits._
    val quality = round(graft.operators.TextPipeline.qualityCol, 4)
    val base = docs
      .select(col("doc_id"), col("source"), col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("n_tokens"),
        quality.as("quality"),
        md5(lower(trim(col("text")))).as("text_hash"),
        md5(concat(lit("tb:"), col("doc_id"))).as("skey"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        floor(col("quality") * 10000d + 0.5d).cast("long").as("quality_q4"),
        col("text_hash"), col("skey"),
        when(col("quality") < minQuality, "quality_gate").as("outcome"))
      .as[(Long, String, String, Long, Long, String, String, String)]
    val afterDedup = base.groupByKey(_._6)
      .flatMapGroupsWithState[SeenDigest, TraceRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TraceRow], state: GroupState[SeenDigest]) =>
          var seen = state.getOption.exists(_.seen)
          val out = rows.toSeq.sortBy(_._1).map { r =>
            if (r._8 != null) r
            else if (!seen) { seen = true; r }
            else r.copy(_8 = "dedup_exact")
          }
          if (seen) state.update(SeenDigest(true))
          out.iterator
      }
    val afterCap = afterDedup.groupByKey(_._2)
      .flatMapGroupsWithState[CapState, TraceRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TraceRow], state: GroupState[CapState]) =>
          var admitted = state.getOption.map(_.admitted).getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { r =>
            if (r._8 != null) r
            else if (admitted < k) { admitted += 1; r }
            else r.copy(_8 = "domain_cap")
          }
          state.update(CapState(admitted))
          out.iterator
      }
    afterCap.groupByKey(_._3)
      .flatMapGroupsWithState[BudgetState, TraceRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[TraceRow], state: GroupState[BudgetState]) =>
          var used = state.getOption.map(_.used).getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r._7, r._1)).map { r =>
            if (r._8 != null) r
            else if (used < budget) { used += r._4; r }
            else r.copy(_8 = "token_budget")
          }
          state.update(BudgetState(used))
          out.iterator
      }
      .toDF("doc_id", "source", "lang", "n_tokens", "quality_q4",
        "text_hash", "skey", "outcome")
      .select(col("doc_id"), col("source"), col("lang"), col("n_tokens"),
        col("quality_q4"),
        coalesce(col("outcome"), lit("admitted")).as("outcome"))
  }

  /** Streaming WordPiece pricing gate — the frozen-tokenizer twin of
    * [[classifierGateStream]] for the THIRD tokenizer family: every
    * arriving document prices itself in frozen-WordPiece tokens
    * ([[graft.operators.WordPieceTrainer.FrozenPieces]] greedy
    * longest-match, the exact batch arithmetic of
    * `wordpieceWordSymbols` — spec-proven equal on the same docs) and
    * rows over `maxTokens` drop before storage. Emits `n_wp_tokens`
    * (priced words only — the batch accountants' inner-join contract:
    * an unsegmentable word contributes 0) and `n_unpriced_words`;
    * `requireFullyPriced` also drops documents containing any
    * unsegmentable word (the [UNK]-refusal ingest policy).
    *
    * Shape: STATELESS — the released piece set is a bounded closure
    * constant (≤ alphabet + merge count entries), greedy matching is a
    * per-row pure function (no join, no state, no watermark, no
    * shuffle); the deterministic Scala function stands in for a native
    * expression because greedy longest-match has a data-dependent
    * advance no built-in fold expresses.
    */
  def wordpieceGateStream(docs: DataFrame,
      maxTokens: Long = Long.MaxValue,
      requireFullyPriced: Boolean = true): DataFrame = {
    import graft.operators.WordPieceTrainer
    val pieces = WordPieceTrainer.FrozenPieces.toSet
    val price = udf { (text: String) =>
      val words = Option(text).getOrElse("").split(" ").filter(_.nonEmpty)
      var toks = 0L
      var unpriced = 0L
      words.foreach { w =>
        val n = WordPieceTrainer.greedyEncode(w, pieces).length
        if (n == 0) unpriced += 1L else toks += n.toLong
      }
      (toks, unpriced)
    }
    // inline(array(...)) feeds a Generate node, which Catalyst cannot
    // re-inline per field reference — the struct prices ONCE per row
    // (the textLangId single-evaluation discipline)
    val priced = docs
      .select(col("*"), inline(array(price(col("text")))))
      .withColumnRenamed("_1", "n_wp_tokens")
      .withColumnRenamed("_2", "n_unpriced_words")
      .filter(col("n_wp_tokens") <= maxTokens)
    if (requireFullyPriced) priced.filter(col("n_unpriced_words") === 0L)
    else priced
  }

  /** Stateless streaming twin of the Gopher/MassiveText rule battery
    * ([[graft.operators.CorpusRules.gopherRules]]): every rule input —
    * word count, mean word length, distinct-stopword presence, top-word
    * repetition share — is computed per document from the text column
    * alone via higher-order functions (the top-word count folds over the
    * distinct-token list; documents are bounded, so the per-row fold is
    * O(doc²) at worst on a KB-sized value — no shuffle, no state, no
    * watermark), with the EXACT batch quantization (q2 mean length, q4
    * top share), so the stream keep-set equals the batch battery's on
    * the same documents (spec-proven). Documents failing any rule drop
    * before storage; the rule columns ride along for telemetry.
    */
  def gopherGateStream(docs: DataFrame): DataFrame = {
    val stopLit = array(
      Seq("the", "a", "of", "and", "is", "not").map(lit): _*)
    val toks = filter(graft.functions.TextFunctions.tokens(col("text")),
      t => length(t) > 0)
    docs
      // zero-token docs have no rule rows in the batch battery (its
      // per-word agg emits nothing); drop them here, not score them
      .filter(size(toks) > 0)
      .withColumn("n_words", size(toks).cast("long"))
      // the null-guarded divisor: ANSI division by zero THROWS even for
      // doubles, and predicate pushdown can evaluate these projections
      // under a reordered conjunction before the size(toks) > 0 guard —
      // a zero divisor becomes NULL (row already doomed), never an error
      .withColumn("_nw_safe",
        when(col("n_words") > 0, col("n_words")))
      .withColumn("mean_len_q2",
        floor(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
          .cast("double") / col("_nw_safe") * 100d + 0.5d).cast("long"))
      .withColumn("n_stopwords",
        size(array_intersect(array_distinct(toks), stopLit)).cast("long"))
      .withColumn("top_share_q4",
        floor(array_max(transform(array_distinct(toks),
            w => size(filter(toks, t => t === w))))
          .cast("double") / col("_nw_safe") * 10000d + 0.5d).cast("long"))
      .drop("_nw_safe")
      .filter(col("n_words") >= 50 && col("n_words") <= 100000 &&
        col("mean_len_q2") >= 300 && col("mean_len_q2") <= 1000 &&
        col("n_stopwords") >= 2 && col("top_share_q4") <= 2000)
  }
}
