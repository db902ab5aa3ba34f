package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{Retrieval, RetrievalProgram, TextPipeline}

/** The composed RAG program's contract: its probe must equal composing
  * the STANDALONE pieces — the spec rebuilds the chunk corpus
  * independently (its own slicing code, not the program's), recomputes
  * the nano-quantized BM25 ranking DRIVER-SIDE in plain Scala (round
  * 14: the chain ranks by exact integer weight sums, so the replay
  * does too — independent of both the program's plan and Retrieval's
  * Column expressions), derives an independently-written
  * probed-cluster cosine ranking, fuses with the RRF formula, and
  * requires row-for-row agreement with [[RetrievalProgram]]'s output.
  * The DuckDB oracle is the third independent replay.
  */
class RetrievalProgramSpec extends AnyFunSuite with Matchers
    with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Independent chunk corpus: same (win=32, stride=24) contract as the
    * chunk_sliding driver query, hand-rolled here (slice over the raw
    * split, chunk_id = doc_id*1024 + idx). */
  private def chunksIndependent(): DataFrame = {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    d.select(col("doc_id"), col("toks"),
        when(F.size(col("toks")) <= 32, lit(1L))
          .otherwise(floor((F.size(col("toks")) - 9).cast("double") / 24.0)
            .cast("long") + 1L).as("nc"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("nc") - 1L)).as("chunk_idx"))
      .select((col("doc_id") * 1024L + col("chunk_idx")).as("chunk_id"),
        slice(col("toks"), (col("chunk_idx") * 24L + 1L).cast("int"),
          lit(32)).as("ctoks"))
  }

  /** Independent sparse hash-embed: explode + groupBy (a different plan
    * than the program's in-expression fold — agreement proves the fold). */
  private def sparseIndependent(chunks: DataFrame): DataFrame = {
    val h = md5(col("token"))
    val bucket = pmod(conv(substring(h, 1, 4), 16, 10).cast("long"),
      lit(64L))
    val sign = when(substring(h, 5, 1).isin(
      "0", "1", "2", "3", "4", "5", "6", "7"), lit(1L)).otherwise(lit(-1L))
    chunks.select(col("chunk_id"), explode(col("ctoks")).as("token"))
      .filter(F.length(col("token")) > 0)
      .select(col("chunk_id"), bucket.as("pos"), sign.as("sgn"))
      .groupBy("chunk_id", "pos").agg(sum(col("sgn")).as("v"))
      .filter(col("v") =!= 0L)
  }

  test("the composed probe equals fusing the standalone BM25 and an " +
    "independently-computed probed-cluster cosine ranking") {
    import spark.implicits._
    val chunks = chunksIndependent().localCheckpoint()
    val sparse = sparseIndependent(chunks).localCheckpoint()

    // --- standalone text side: BM25 recomputed DRIVER-SIDE in Scala
    // (independent of the program's plan AND of Retrieval's Column
    // expressions), with the same nano-quantized per-term weights the
    // chain sums — floor(w * 1e9 + 0.5) as Long, so the per-chunk score
    // is an exact integer whatever the summation order
    val terms = Retrieval.QueryTerms.toSet
    val chunkToks = chunks
      .select(col("chunk_id"), col("ctoks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    val nCorpus = chunkToks.size.toLong
    val avgdl = chunkToks.values.map(_.size.toLong).sum.toDouble / nCorpus
    val tfRows = chunkToks.toSeq.flatMap { case (id, toks) =>
      toks.filter(terms).groupBy(identity).map { case (t, occ) =>
        (id, toks.size.toLong, t, occ.size.toLong)
      }
    }
    val dfTerm = tfRows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    def wq9(tf: Long, dl: Long, df: Long): Long = {
      val idf = math.log(1.0 + (nCorpus - df + 0.5) / (df + 0.5))
      val sat = tf.toDouble * (1.2 + 1.0) /
        (tf.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * dl.toDouble / avgdl))
      math.floor(idf * sat * 1000000000d + 0.5d).toLong
    }
    val scores = tfRows.groupBy(_._1).view.mapValues(_.map {
      case (_, dl, t, tf) => wq9(tf, dl, dfTerm(t))
    }.sum).toMap
    val textRank = scores.toSeq
      .sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }
      .toMap

    // --- standalone vec side: seeds, assignment, probe, cosine rank
    val q = Retrieval.QueryTerms.toDF("token")
    val qs = sparseIndependent(
      q.select(lit(0L).as("chunk_id"), array(col("token")).as("ctoks"))
        .groupBy("chunk_id").agg(flatten(collect_list(col("ctoks")))
          .as("ctoks")))
      .select(col("pos"), col("v").as("qv")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n2q = qs.values.map(v => v * v).sum
    val vecs = sparse.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap)
      .toMap
    def dot(a: Map[Long, Long], b: Map[Long, Long]): Long =
      a.map { case (p, v) => v * b.getOrElse(p, 0L) }.sum
    def n2(a: Map[Long, Long]): Long = a.values.map(v => v * v).sum
    val seedIds = vecs.keys.toSeq.sorted.take(4)
    def cos(d: Long, na: Long, nb: Long): Double =
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    // assignment: argmax cosine to seeds, ties to the lowest seed
    val cluster = vecs.map { case (id, v) =>
      id -> seedIds.zipWithIndex.map { case (s, i) =>
        (cos(dot(v, vecs(s)), n2(v), n2(vecs(s))), i)
      }.sortBy { case (c, i) => (-c, i) }.head._2
    }
    val probed = seedIds.zipWithIndex.map { case (s, i) =>
      (cos(dot(qs, vecs(s)), n2(vecs(s)), n2q), i)
    }.sortBy { case (c, i) => (-c, i) }.take(2).map(_._2).toSet
    val vecRank = vecs.keys.toSeq
      .filter(id => probed.contains(cluster(id)))
      .map(id => (id, cos(dot(vecs(id), qs), n2(vecs(id)), n2q)))
      .sortBy { case (id, c) => (-c, id) }.take(20)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }
      .toMap

    // --- fuse with the RRF formula and compare to the program
    def rrf(id: Long): Double = {
      val t = textRank.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      val v = vecRank.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      math.floor((t + v) * 1e6 + 0.5) / 1e6
    }
    val expected = (textRank.keySet ++ vecRank.keySet).toSeq
      .map(id => (id, rrf(id)))
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex
      .map { case ((id, s), i) => ((i + 1).toLong, id, textRank.get(id),
        vecRank.get(id), s) }
    val got = RetrievalProgram.retrievalProgram(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]),
        r.getDouble(6))).toSeq
    got shouldBe expected
  }

  test("the funnel's chunk inventory matches the standalone " +
    "chunk_sliding operator") {
    val funnel = RetrievalProgram.retrievalFunnel(spark, sf)
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3))).toMap
    val ch = TextPipeline.chunkSliding(spark, sf)
    funnel("chunks")._1 shouldBe ch.count()
    funnel("chunks")._2 shouldBe
      ch.select("doc_id").distinct().count()
    // candidate counts are the two sides' top-kEach sizes
    funnel("candidates")._1 should be <= 20L
    funnel("candidates")._2 should be <= 20L
    funnel("fused")._1 should be <= 10L
    funnel("fused")._1 should be > 0L
  }

  test("the program's final plan reads NO corpus text — every stage " +
    "sits behind the chunk-manifest fence") {
    val plan = RetrievalProgram.retrievalProgram(spark, sf)
      .queryExecution.explainString(FormattedMode)
    plan should not include "documents.parquet"
  }
}
