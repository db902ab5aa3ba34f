package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical-plan invariants as CI: the scale-killer patterns PlanAudit's
  * human-run dump used to catch now fail the build. Planning only (no
  * execution) — AQE's initial plan carries every invariant asserted here.
  */
class PlanAuditSpec extends AnyFunSuite with Matchers with SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.explainString(FormattedMode)
    }

  /** Detail-section headers like `(5) Exchange` — one per real exchange
    * node; ReusedExchange deliberately not counted (it is the optimization).
    */
  private def exchanges(plan: String): Int =
    """(?m)^\(\d+\) Exchange""".r.findAllIn(plan).size

  test("no query plans a cartesian product") {
    plans.foreach { case (name, p) =>
      withClue(s"$name: ") { p should not include "CartesianProduct" }
    }
  }

  test("broadcast nested-loop joins only where the build side is a 1-row broadcast") {
    // the whitelist lives on PlanAudit so the dev dump and this gate agree
    plans.foreach { case (name, p) =>
      if (!PlanAudit.bnljWhitelist.contains(name))
        withClue(s"$name: ") { p should not include "BroadcastNestedLoopJoin" }
    }
  }

  test("q6 pushes date/quantity predicates into the parquet scan and prunes columns") {
    val p = plans("q6_filter")
    p should include("GreaterThanOrEqual(l_shipdate")
    p should include("LessThan(l_shipdate")
    p should include("LessThan(l_quantity")
    val cols = """ReadSchema: struct<([^>]*)>""".r
      .findFirstMatchIn(p).get.group(1).split(",").length
    cols shouldBe 4 // l_quantity, l_extendedprice, l_discount, l_shipdate
  }

  test("scans are pruned: single-table text/media queries read only needed columns") {
    // documents has (doc_id, text, lang, n_chars, ...); these operators must
    // not drag unused columns through the scan
    Seq("text_fingerprint" -> 2, "text_normalize" -> 2, "dedup_exact" -> 2,
      "media_meta" -> 3, "media_resize" -> 3, "dedup_report" -> 1,
      "ngram_counts" -> 2, "corpus_sample" -> 2, "emb_normalize" -> 2,
      "seq_len_buckets" -> 1, "stratified_sample" -> 2,
      "pack_chunks" -> 3, "media_dedup" -> 3, "corpus_shuffle" -> 1,
      "split_train" -> 1, "chunk_sliding" -> 2).foreach { case (name, maxCols) =>
      val cols = """ReadSchema: struct<([^>]*)>""".r
        .findFirstMatchIn(plans(name)).get.group(1).split(",").length
      withClue(s"$name: ") { cols should be <= maxCols }
    }
  }

  test("exchange ceilings hold for the dedup/similarity/fingerprint family") {
    // calibrated against the round-3 plans; a regression that re-introduces
    // the fence shuffle (text_fingerprint), the 16x regroup (emb_neardup) or
    // an extra join shuffle fails here
    val ceilings = Map(
      "text_fingerprint" -> 1, // the final orderBy only
      "dedup_exact" -> 2,
      "dedup_simhash" -> 6,
      "dedup_minhash" -> 10,
      "dedup_jaccard" -> 10,
      "dedup_pipeline" -> 14,
      "emb_neardup" -> 10,
      "sim_topk" -> 1, // TakeOrdered, no global sort
      "sim_topk_ivf" -> 4,
      "emb_centroid_stats" -> 2,
      // round-4 additions, calibrated against the current plans
      "text_tfidf" -> 5, // tf shuffle + df/N derivations + orderBy
      "decontaminate" -> 3, // fingerprint agg + per-doc count + orderBy
      "sim_topk_batch" -> 2, // per-query window + orderBy; probe broadcast
      "corpus_sample" -> 1, // stateless filter; orderBy only
      "salted_counts" -> 3, // two-phase salted agg + orderBy
      "stats_quantiles" -> 2,
      "media_resize" -> 1, // stateless projection; orderBy only
      "ngram_counts" -> 2,
      "dedup_report" -> 2, // digest agg + 1-row rollup
      "emb_normalize" -> 1, // stateless projection + explode; orderBy only
      "seq_len_buckets" -> 2,
      // the round-4 relational/pipeline batch, calibrated at sf0.01 (AQE
      // broadcasts MORE at smaller SFs, so these are safe upper bounds)
      "q4_priority" -> 2, // semi-join + priority agg
      "q7_volume" -> 2, // nation dims broadcast; l-o join + group
      "q13_custdist" -> 3, // outer join + two chained aggs
      "q15_top_supplier" -> 4, // rev agg + max + supplier join + orderBy
      "q17_small_qty" -> 2, // per-part cut agg reuses the join exchange
      "q19_disjunct" -> 1, // part join; single-row final agg
      "q22_idle" -> 3, // avg broadcast + anti-join + segment agg
      "ship_delay" -> 2, // o-l join + priority agg
      "stratified_sample" -> 1, // stateless filter; orderBy only
      "pack_chunks" -> 2, // one keyed window shuffle + chunk agg
      // TPC-H completion batch; the scalar-subquery shapes (q2, q11) plan
      // their shared subtree twice but AQE stage-reuse dedups it at runtime
      "q2_min_cost" -> 6,
      "q8_market_share" -> 2,
      "q9_profit" -> 2,
      "q11_important_part" -> 8,
      "q16_supplier_count" -> 3,
      "q20_excess" -> 2,
      "q21_waiting" -> 5,
      // training-pipeline batch: digest agg / broadcast-weights filter /
      // per-shard window / stateless split
      "media_dedup" -> 3,
      // post-checkpoint plan: cluster-size window + orderBy (the iterated
      // label joins live behind localCheckpoint leaves)
      "dedup_clusters" -> 3,
      "mixture_sample" -> 2,
      "corpus_shuffle" -> 2,
      "split_train" -> 1,
      // window/set/sketch batch
      "window_lag" -> 2, // one keyed window + orderBy
      "q1_cube" -> 2, // expand + partial agg; lattice is tiny
      "intersect_users" -> 3, // two distinct sides + semi-join
      "heavy_hitters" -> 4, // token agg + 1-row total broadcast + orderBy
      "corpus_distinct" -> 3,
      "chunk_sliding" -> 2, // tokenize fence + orderBy
      "emb_clusters" -> 3, // post-checkpoint window + orderBy
      "assign_ids" -> 4, // shard agg + offsets + per-shard window + orderBy
      "sample_fixed_k" -> 2, // keyed window + orderBy
      "unpivot_stats" -> 2) // stateless explode; orderBy only
    ceilings.foreach { case (name, ceiling) =>
      withClue(s"$name: ") { exchanges(plans(name)) should be <= ceiling }
    }
  }

  test("decontaminate and text_tfidf read the corpus text once") {
    // decontaminate: single winnow subtree by construction (one scan total).
    // text_tfidf: df comes from a window over tf and N from a doc_id-only
    // pruned scan, so exactly one scan touches the text column.
    def textScans(plan: String): Int =
      """ReadSchema: struct<([^>]*)>""".r.findAllMatchIn(plan)
        .count(_.group(1).contains("text"))
    withClue("decontaminate: ") {
      """(?m)^\(\d+\) Scan parquet""".r
        .findAllIn(plans("decontaminate")).size shouldBe 1
    }
    withClue("text_tfidf: ") { textScans(plans("text_tfidf")) shouldBe 1 }
  }

  test("the flagship alarm replay keeps its shuffles keyed (no single-partition funnels)") {
    // hc_alarm_transitions: grid + per-minute max + two keyed window passes;
    // every exchange must be hash-partitioned by event_type (+ the final
    // orderBy range exchange) — a SinglePartition exchange would serialize
    // the whole table through one task at 100 TB
    val p = plans("hc_alarm_transitions")
    val single = """(?m)^Arguments: SinglePartition""".r.findAllIn(p).size
    single shouldBe 0
  }
}
