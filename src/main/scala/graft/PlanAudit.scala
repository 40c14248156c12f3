package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    // the ONE session recipe (Harness.newSession) — a hand-inlined
    // builder here had already drifted (log level, hardcoded core
    // count) and would silently miss any future plan-affecting conf,
    // making the audited exchange counts reflect plans the verified
    // mains never run
    val spark = Harness.newSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = "/root/testdata/sf0.01"
    val targets = Seq("q_agg_stats", "q_agg_conditional", "q_agg_collect",
      "q_window_nav", "q_join_range_binned", "q_join_overlap", "q_dedup_edit",
      // q_graph_pagerank is EXCLUDED like the metric wrappers: ranks()
      // returns an eagerly localCheckpoint'ed frame, so the audited plan
      // is a Scan ExistingRDD that hides every per-iteration exchange —
      // while plan construction executes the full job as a side effect
      "q_quality", "q_ts_gapfill", "q_profile_cat",
      "q_topk_groups", "q_fn_binary", "q_agg_hll_merge",
      "q_embed_project", "q_sample_shard", "q_text_html", "q_source_binary",
      "q_pack_concat", "q_cdc_apply", "q_profile_bucket", "q_join_asof_tol",
      "q_vocab_oov", "q_decon_ngram", "q_sample_dsir", "q_sample_mix",
      "q_split_leakfree", "q_sketch_heavy", "q_pq_codes", "q_ann_pq",
      "q_graph_reach", "q_ts_ewma", "q_ts_islands", "q_window_median",
      "q_attr_lasttouch", "q_embed_standard", "q_diff_snapshots",
      "q_geo_nearest", "q_ann_ivfpq", "q_agg_retract", "q_incremental_join",
      "q_join_temporal", "q_sketch_heavy_group", "q_fn_csv",
      "q_text_perplexity", "q_eval_ece", "q_eval_annrecall",
      "q_sink_bucketed", "q_stream_timetravel", "q_join_notin",
      "q_profile_corr", "q_profile_mi", "q_eval_sliced", "q_eval_rbo",
      "q_ts_ohlc", "q_attr_linear", "q_dedup_contain", "q_vocab_bpe",
      "q_vocab_pieces", "q_sample_reservoir", "q_embed_pca",
      "q_sink_csvtrip", "q_sink_rawjson", "q_sink_ddl",
      "q_media_phash_img", "q_media_neardup_img",
      "q_ts_rollunique_hll", "q_vocab_bpe_batched", "q_media_audio",
      "q_media_frames_gif", "q_media_neardup_frames", "q_media_frames_avi",
      "q_sink_jdbc",
      // q_load_metrics / q_meta_stats return driver-local metric rows
      // (LocalTableScan) — auditing them would print the wrapper's
      // plan, not the real write/scan, while executing both as a side
      // effect; their physical behavior is asserted in SinksSpec
      "q_ann_partitioned")
    for (n <- targets) {
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(plan).size
      val flags = Seq(
        "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
        "cartesian" -> plan.contains("CartesianProduct"),
        "bcast" -> plan.contains("BroadcastHashJoin"),
        "window" -> plan.contains("Window")).collect { case (k, true) => k }
      println(f"$n%-22s exchanges=$ex%-3d ${flags.mkString(",")}")
    }
    spark.stop()
  }
}
