package graft

import org.apache.spark.sql.functions._

/** Pins the cross-engine determinism engineering: results must be
  * bit-identical regardless of how the input is partitioned (different
  * partition counts change Spark's partial-aggregation grouping and task
  * ordering — exactly the degrees of freedom the decimal casts,
  * integer-quantized arithmetic, and unique tiebreakers exist to
  * neutralize). A regression that re-introduces order-dependent floating
  * aggregation fails here before it flakes the oracle gate. */
class DeterminismSpec extends SparkTestBase {

  private def resultSet(name: String): Set[Seq[Any]] =
    SparkEntry.queries(name)(spark, Sf).collect().map(_.toSeq).toSet

  private def repartitioned(parts: Int)(name: String): Set[Seq[Any]] = {
    // route the same query through a session-level shuffle-partition change:
    // partial aggregation trees and merge orders differ, results must not
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try resultSet(name)
    finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("decimal-summed aggregates are shuffle-partitioning-invariant") {
    Seq("q1_pricing_summary", "q5_region_volume", "events_zscore_outliers").foreach { q =>
      val a = repartitioned(2)(q)
      val b = repartitioned(17)(q)
      assert(a == b && a.nonEmpty, q)
    }
  }

  test("hash-derived signatures and scores are shuffle-partitioning-invariant") {
    Seq("dedup_simhash", "ann_cosine_topk", "text_lm_fluency").foreach { q =>
      val a = repartitioned(2)(q)
      val b = repartitioned(17)(q)
      assert(a == b && a.nonEmpty, q)
    }
  }

  test("window/top-k tiebreakers make rank output partitioning-invariant") {
    Seq("q_window_topn", "q3_topk_revenue", "pipeline_stratified_sample").foreach { q =>
      val a = repartitioned(2)(q)
      val b = repartitioned(17)(q)
      assert(a == b && a.nonEmpty, q)
    }
  }

  test("round-8 additions are shuffle-partitioning-invariant") {
    // dsir: integer-scaled importance with floor-div normalization and
    // doc_id-tiebroken top-k; semantic dedup: argmax-aggregate cluster
    // assignment + min-keeper aggregation; phash: banded candidate set +
    // exact hamming; unimax: single-partition waterfilling window;
    // cascade: pure projection; manifest diff: two verdict arms over one
    // pinned signal frame into the keyed 5-state diff
    Seq("pipeline_dsir_select", "dedup_semantic", "mm_phash_dedup",
      "pipeline_unimax_mix", "pipeline_filter_cascade", "pipeline_manifest_diff")
      .foreach { q =>
        val a = repartitioned(2)(q)
        val b = repartitioned(17)(q)
        assert(a == b && a.nonEmpty, q)
      }
  }

  test("late round-8 additions are shuffle-partitioning-invariant") {
    // ccnet buckets: hash-ranked sample thresholds + stateless labels;
    // length buckets: doc_id-ordered row_number batching with integer
    // capacity; shared frames: aligned-chunk fingerprints, capped buckets,
    // integer counts
    Seq("text_ccnet_buckets", "pipeline_length_buckets", "mm_video_shared_frames",
      "text_bpe_encode")
      .foreach { q =>
        val a = repartitioned(2)(q)
        val b = repartitioned(17)(q)
        assert(a == b && a.nonEmpty, q)
      }
  }

  test("round-8 finale additions are shuffle-partitioning-invariant") {
    // doremi: integer EG loop over pinned tiny frames (floor-div mixture
    // mean + renormalization each round); fertility: trained-segmentation
    // rollup with one final IEEE division; dist drift: integer ppm
    // histogram shares + windowed TVD over the tiny grouped frame
    Seq("pipeline_doremi_weights", "text_bpe_fertility", "diff_dist_drift",
      // substring spans: df-banded candidates + diag-island windows —
      // pure relational, partition-count-free
      "dedup_substring_spans",
      // matryoshka: integer prefix scores, per-probe windows with full
      // (score, neighbor_id) tiebreaks
      "ann_matryoshka_topk",
      // capstone: every stage integer/hash-deterministic by construction
      "pipeline_curation_e2e")
      .foreach { q =>
        val a = repartitioned(2)(q)
        val b = repartitioned(17)(q)
        assert(a == b && a.nonEmpty, q)
      }
  }

  test("round-3 additions are shuffle-partitioning-invariant") {
    // rfm: ntile over doubles with user_id tiebreaks; gapfill: generated
    // grid + forward-fill window; prefix join: candidate set + array
    // intersection; mad: two rank-median passes
    Seq("events_rfm", "events_gapfill", "dedup_prefix_jaccard", "events_mad_outliers")
      .foreach { q =>
        val a = repartitioned(2)(q)
        val b = repartitioned(17)(q)
        assert(a == b && a.nonEmpty, q)
      }
  }

  test("final round-3 additions are shuffle-partitioning-invariant") {
    // triangles/bfs: integer graph counts through multi-join plans;
    // changepoint: exact decimal cross-multiplied argmax; kmv jaccard:
    // md5-ordered k-min sets; rrf: integer ranks fused in doubles;
    // attribution: running-last over a unioned timeline; ab test:
    // decimal moments to a Welch z
    Seq("dedup_triangles", "dedup_bfs_hops", "dedup_pagerank",
      "events_changepoint", "sketch_kmv_jaccard", "ann_hybrid_rrf",
      "events_attribution", "events_ab_test", "mm_video_features",
      "sketch_sample_quantiles", "ann_kmeans", "er_blocked_matches",
      "events_seasonal_forecast", "q_association_rules",
      "pipeline_priority_sample")
      .foreach { q =>
        val a = repartitioned(2)(q)
        val b = repartitioned(17)(q)
        assert(a == b && a.nonEmpty, q)
      }
  }

  test("late round-3 additions are shuffle-partitioning-invariant") {
    // q17: exact-integer threshold inequality + decimal revenue sum;
    // three-way merge: md5 row fingerprints through two full joins;
    // incremental agg: decimal base+delta fold; novelty: exact rational;
    // ranks: tie-stable rank/dense_rank/cume_dist
    // label_prop: (count DESC, label ASC) argmax rounds — the tie order,
    // not arrival order, decides every adopted label
    // round-5: frontier BFS (min-hop per vertex must not depend on
    // frontier-join task order), kmv setops (pinned-op-order millis)
    Seq("q17_small_qty", "diff_three_way", "diff_incremental_agg",
      "text_novelty", "q_window_ranks", "profile_orders",
      "dedup_containment", "events_dau_wau", "events_paths",
      "pipeline_epoch_shuffle", "dedup_label_prop", "sketch_cms_terms",
      "dedup_bfs_hops", "sketch_kmv_setops")
      .foreach { q =>
        val a = repartitioned(2)(q)
        val b = repartitioned(17)(q)
        assert(a == b && a.nonEmpty, q)
      }
  }
}
