package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The persisted form of [[RetrievalProgram]] — build the RAG serving
  * artifacts ONCE, probe many times (round 14; the `ivfpq_store`
  * discipline applied to the composed retrieval chain). The in-query
  * program re-chunks, re-embeds, re-assigns, and re-indexes the corpus
  * on EVERY probe; production builds those four artifacts once, appends
  * document deltas, and serves probes that never touch corpus text.
  *
  * Layout under `path` (all segments immutable, manifest versioned by
  * [[StoreVersioning]] — kind "seg"):
  *
  *  - `seeds/` + `seednorms/` — the FROZEN coarse quantizer (the first
  *    [[RetrievalProgram.NSeeds]] chunk vectors at build time): ≤ 256
  *    (seed_idx, pos, sv) rows + one norm row per seed. Frozen exactly
  *    like [[PersistedIndex.buildIvfIndex]]'s centroids — appended
  *    chunks are assigned to build-time seeds (weekly-rebuild trade).
  *  - `chunkmeta/ingest=<t>/` — (chunk_id, dl): the chunk manifest's
  *    id + token-length rows (the BM25 normalizer reads ONLY this).
  *  - `vectors/ingest=<t>/cluster=C/` — (chunk_id, pos, v): sparse
  *    signed hash-embedding entries, hive-partitioned by the assigned
  *    coarse cluster so a probe's vector side scans ONLY its probed
  *    partitions (the [[PersistedIndex.probeIvfIndex]] DPP shape).
  *  - `norms/ingest=<t>/cluster=C/` — (chunk_id, n2): per-chunk exact
  *    integer norm, same partitioning.
  *  - `postings/ingest=<t>/` — (term, chunk_id, tf, dl): the chunk
  *    inverted index; a probe filters to its query terms, which lands
  *    in the parquet scan's PushedFilters (plan-asserted).
  *
  * The probe replays [[RetrievalProgram]]'s stage 4+5 byte-for-byte
  * (same seeded probe decision, same BM25 formula over the same
  * (chunk_id, dl, term, tf) rows, same integer cosine, same RRF fuse),
  * so `retrieval_store` answers the SAME chain oracle as
  * `retrieval_program` — the green hash proves build + append + probe
  * equals the in-query composition.
  */
object RetrievalStore {

  import RetrievalProgram.IdBase

  private def segs(spark: SparkSession, path: String,
      version: Long): Seq[String] =
    StoreVersioning.liveTokens(spark, s"$path/manifest", version)
      .getOrElse("seg", Seq.empty)

  /** Chunk → sparse-embed → assign-to-frozen-seeds → land one immutable
    * segment (vectors/norms cluster-partitioned, postings, chunkmeta). */
  private def writeSegment(spark: SparkSession, chunks: DataFrame,
      path: String, token: String): Unit = {
    val (sparse, norms) = RetrievalProgram.embedStages(chunks)
    writeSegmentFrom(spark, chunks, sparse, norms, path, token)
  }

  /** [[writeSegment]] with the embed stages precomputed — the build
    * path already fenced them for seed selection, so re-embedding the
    * whole corpus here would double the build's heaviest pass. */
  private def writeSegmentFrom(spark: SparkSession, chunks: DataFrame,
      sparse: DataFrame, norms: DataFrame, path: String,
      token: String): Unit = {
    val seedVecs = spark.read.parquet(s"$path/seeds")
    val seedNorms = spark.read.parquet(s"$path/seednorms")
    val assigned = RetrievalProgram.assignToSeeds(sparse, norms,
      seedVecs, seedNorms)
    graft.sources.CorpusWriter.writePartitioned(
      sparse.join(assigned, "chunk_id")
        .select(col("chunk_id"), col("pos"), col("v"), col("cluster")),
      s"$path/vectors/ingest=$token", Seq("cluster"), "chunk_id")
    graft.sources.CorpusWriter.writePartitioned(
      norms.join(assigned, "chunk_id")
        .select(col("chunk_id"), col("n2"), col("cluster")),
      s"$path/norms/ingest=$token", Seq("cluster"), "chunk_id")
    chunks
      .select(col("chunk_id"), size(col("ctoks")).cast(LongType).as("dl"),
        explode(col("ctoks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term"), col("chunk_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/postings/ingest=$token")
    chunks
      .select(col("chunk_id"), size(col("ctoks")).cast(LongType).as("dl"))
      .write.mode(SaveMode.Overwrite).parquet(s"$path/chunkmeta/ingest=$token")
  }

  /** Build the store: chunk the corpus, freeze the seed quantizer from
    * the base build's first chunk vectors, land the base segment,
    * publish manifest version 1. */
  def buildRetrievalStore(spark: SparkSession, corpus: DataFrame,
      path: String): Unit = {
    val chunks = RetrievalProgram.chunkStage(corpus)
    val (sparse, norms) = RetrievalProgram.embedStages(chunks)
    val (seedVecs, seedNorms) = RetrievalProgram.seedStage(sparse)
    seedVecs.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/seeds")
    seedNorms.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$path/seednorms")
    writeSegmentFrom(spark, chunks, sparse, norms, path, "base")
    StoreVersioning.commitTokens(spark, s"$path/manifest",
      Seq(("seg", "base")))
  }

  /** Fold a batch of new documents in: drop doc_ids the live segments
    * already hold (a replayed batch is a no-op — the ingest-stream
    * idempotence contract), chunk + embed + assign the survivors
    * against the FROZEN seeds, land an immutable segment, publish a
    * version. Pinned readers of the old version never see it. */
  def appendToRetrievalStore(spark: SparkSession, docBatch: DataFrame,
      path: String): Unit = {
    val live = segs(spark, path, -1L)
    val storedDocs = spark.read.parquet(s"$path/chunkmeta")
      .filter(col("ingest").isInCollection(live))
      .select(floor(col("chunk_id") / IdBase).cast(LongType).as("doc_id"))
      .distinct()
    val fresh = docBatch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id")
      .join(storedDocs, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    if (fresh.isEmpty) return // full replay — nothing to fold
    val token =
      s"d${StoreVersioning.latestVersion(spark, s"$path/manifest") + 1}"
    writeSegment(spark, RetrievalProgram.chunkStage(fresh), path, token)
    StoreVersioning.commitTokens(spark, s"$path/manifest",
      (live :+ token).map(("seg", _)))
  }

  /** Compact a delta-grown store: fold every live segment's rows into
    * ONE new `ingest=c<v>` segment and publish it as the next manifest
    * version — readers pinned to the old version keep their segments
    * (nothing is deleted here; [[PersistedIndex.retainStore]] is the
    * retention pass). Rows are copied verbatim: the seeds are frozen,
    * so re-chunking/re-embedding/re-assigning is a no-op by
    * construction — cheaper not to re-run it (the
    * [[PersistedIndex.compactIvfPqIndex]] discipline).
    */
  def compactRetrievalStore(spark: SparkSession, path: String): Unit = {
    val live = segs(spark, path, -1L)
    val token =
      s"c${StoreVersioning.latestVersion(spark, s"$path/manifest") + 1}"
    def liveRows(sub: String): DataFrame =
      spark.read.parquet(s"$path/$sub")
        .filter(col("ingest").isInCollection(live))
        .drop("ingest")
        .localCheckpoint() // materialize BEFORE writing into the same tree
    graft.sources.CorpusWriter.writePartitioned(liveRows("vectors"),
      s"$path/vectors/ingest=$token", Seq("cluster"), "chunk_id")
    graft.sources.CorpusWriter.writePartitioned(liveRows("norms"),
      s"$path/norms/ingest=$token", Seq("cluster"), "chunk_id")
    liveRows("postings").write.mode(SaveMode.Overwrite)
      .parquet(s"$path/postings/ingest=$token")
    liveRows("chunkmeta").write.mode(SaveMode.Overwrite)
      .parquet(s"$path/chunkmeta/ingest=$token")
    StoreVersioning.commitTokens(spark, s"$path/manifest",
      Seq(("seg", token)))
  }

  /** The streaming ingest twin — each arriving micro-batch of
    * (doc_id, text) documents folds through the same segment + manifest
    * discipline (at-least-once replays are absorbed by the stored-doc
    * dedup). Start with `.start()`. */
  def retrievalIngestStream(docs: DataFrame, path: String,
      checkpoint: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          appendToRetrievalStore(batch.sparkSession, batch.toDF(), path)
      }

  /** Probe the store: the [[RetrievalProgram]] hybrid probe served
    * entirely from persisted artifacts — the probed-cluster decision
    * reads the ≤ 256-row frozen seeds, the vector side scans ONLY the
    * probed cluster partitions (broadcast cluster join → partition
    * pruning), the text side reads ONLY the query terms' posting rows
    * (term filter in PushedFilters) plus the chunk-length rows for the
    * normalizer. NO corpus text anywhere in the plan (spec-asserted).
    */
  def probeRetrievalStore(spark: SparkSession, path: String,
      version: Long = -1L): DataFrame = {
    val textTop = RetrievalProgram.textRankQ9(
      probeTf(spark, path, version),
      probeDf(spark, path, version), probeStats(spark, path, version))
    val vecTop = RetrievalProgram.vecRank(
      probeVectorScored(spark, path, version))
    RetrievalProgram.finalProjection(
      RetrievalProgram.fuse(textTop, vecTop))
  }

  /** The probe's text-side tf scan — the persisted postings pruned to
    * the query's terms. Exposed unfenced so specs can assert the pushed
    * term filter (the probe's public result sits behind checkpoint
    * fences, which erase upstream plans from the final explain). */
  private[graft] def probeTf(spark: SparkSession, path: String,
      version: Long = -1L): DataFrame =
    spark.read.parquet(s"$path/postings")
      .filter(col("ingest").isInCollection(segs(spark, path, version)))
      .filter(col("term").isin(graft.operators.Retrieval.QueryTerms: _*))
      .select(col("chunk_id"), col("dl"), col("term"), col("tf"))

  private def probeDf(spark: SparkSession, path: String,
      version: Long): DataFrame =
    probeTf(spark, path, version)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  private def probeStats(spark: SparkSession, path: String,
      version: Long): DataFrame =
    spark.read.parquet(s"$path/chunkmeta")
      .filter(col("ingest").isInCollection(segs(spark, path, version)))
      .agg(count(lit(1)).as("n_corpus"),
        avg(col("dl").cast("double")).as("avgdl"))

  /** The probe's vector-side (chunk_id, cosv) frame — probed-cluster
    * partitions only, unfenced (the spec-assertable plan). */
  private[graft] def probeVectorScored(spark: SparkSession, path: String,
      version: Long = -1L): DataFrame = {
    val live = segs(spark, path, version)
    val seedVecs = spark.read.parquet(s"$path/seeds")
    val seedNorms = spark.read.parquet(s"$path/seednorms")
    val (qSparse, qNorm) = RetrievalProgram.queryVec(spark)
    val probe = RetrievalProgram.probeSeeds(qSparse, qNorm,
      seedVecs, seedNorms)
    val norms = spark.read.parquet(s"$path/norms")
      .filter(col("ingest").isInCollection(live))
    val vectors = spark.read.parquet(s"$path/vectors")
      .filter(col("ingest").isInCollection(live))
    val qDots = vectors
      .join(broadcast(probe), "cluster") // partition-pruned scan
      .join(broadcast(qSparse), "pos")
      .groupBy("chunk_id").agg(sum(col("v") * col("qv"))
        .cast(LongType).as("d"))
    val cosV = (coalesce(col("d"), lit(0L)).cast("double")
      / (sqrt(col("n2").cast("double")) * sqrt(col("n2q").cast("double"))))
    norms.join(broadcast(probe), "cluster")
      .join(qDots, Seq("chunk_id"), "left")
      .crossJoin(broadcast(qNorm))
      .select(col("chunk_id"), cosV.as("cosv"))
  }

  private val storeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]

  /** The store as a driver surface: build on the non-delta residue
    * (doc_id % 100 <> 77 — the lsh_store discipline; the seed chunks
    * come from the lowest doc_ids, which stay in the base build), fold
    * the delta residue in with [[appendToRetrievalStore]], probe — must
    * equal [[RetrievalProgram.retrievalProgram]] over the whole corpus
    * (the driver's oracle replays exactly that), proving
    * build + append + probe under frozen seeds. Cached per (app, sfDir).
    */
  private def sessionStore(spark: SparkSession, sfDir: String): String =
    storeCache.synchronized {
      val appId = spark.sparkContext.applicationId
      storeCache.keySet.removeIf(_._1 != appId)
      storeCache.computeIfAbsent((appId, sfDir), _ => {
        val p = java.nio.file.Files
          .createTempDirectory("graft-retrieval-store").toString
        val d = graft.sources.Tables.documents(spark, sfDir)
        val isDelta = pmod(col("doc_id"), lit(100)) === 77
        buildRetrievalStore(spark, d.filter(!isDelta), p)
        appendToRetrievalStore(spark, d.filter(isDelta), p)
        p
      })
    }


  /** Full-content integrity scorecard of the store — one row per
    * persisted artifact with its row count, key count, and an EXACT
    * integer checksum over the ENTIRE content (sum(dl), sum(v·v),
    * sum(n2), sum(tf), sum(chunk_id·(cluster+1))): order-independent
    * BIGINT sums, so any value drift anywhere in the store flips a
    * cell. The driver oracle replays the sums from the SAME chain CTE
    * generator as the probe oracle — this widens the verified surface
    * from the probe's top-k rows to every byte of store content.
    */
  def storeStats(spark: SparkSession, path: String,
      version: Long = -1L): DataFrame = {
    val live = segs(spark, path, version)
    def scan(sub: String): DataFrame = spark.read.parquet(s"$path/$sub")
      .filter(col("ingest").isInCollection(live))
    def row(name: String, df: DataFrame, keys: org.apache.spark.sql.Column,
        checksum: org.apache.spark.sql.Column): DataFrame =
      df.agg(count(lit(1)).cast(LongType).as("n_rows"),
          keys.cast(LongType).as("n_keys"),
          coalesce(checksum, lit(0L)).cast(LongType).as("checksum"))
        .select(lit(name).as("artifact"), col("n_rows"), col("n_keys"),
          col("checksum"))
    row("assign", scan("norms"), countDistinct(col("cluster")),
        sum(col("chunk_id") * (col("cluster") + 1L)))
      .unionAll(row("chunkmeta", scan("chunkmeta"),
        countDistinct(col("chunk_id")), sum(col("dl"))))
      .unionAll(row("norms", scan("norms"),
        countDistinct(col("chunk_id")), sum(col("n2"))))
      .unionAll(row("postings", scan("postings"),
        countDistinct(col("term")), sum(col("tf"))))
      .unionAll(row("vectors", scan("vectors"),
        countDistinct(col("chunk_id")), sum(col("v") * col("v"))))
      .orderBy("artifact")
  }

  /** Driver surface — answers the chain-replayed checksum oracle. */
  def statsFromSessionStore(spark: SparkSession,
      sfDir: String): DataFrame =
    storeStats(spark, sessionStore(spark, sfDir))

  /** Driver surface — answers the retrieval_program chain oracle. */
  def retrievalFromSessionStore(spark: SparkSession,
      sfDir: String): DataFrame =
    probeRetrievalStore(spark, sessionStore(spark, sfDir))
}
