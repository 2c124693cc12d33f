package graft

import graft.queries.Queries

/** Dev/report main: dump formatted physical plans of the headline
  * queries (the evidence for the scale-design claims in README /
  * SURVEY §4). Usage: tools/run_main.sh graft.PlanDump <sfDir> [name...]
  * — extra args override the default headline-query list.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(4)
    val defaultList = Seq(
      "knn_exact_cosine", "knn_filtered_hybrid", "knn_batch",
      "q1_pricing_summary", "q3_shipping_priority",
      "dedup_minhash_lsh", "ev_tumbling_5min", "pipeline_training_prep",
      "ev_asof_last_view", "ev_range_clicks_views",
      "ann_ivf_rule_rewrite", "txt_embed_knn_e2e",
      "knn_filtered_ivf_rewrite", "ann_ivf_kmeans_rewrite",
      "ev_gaps_lag_pctrank", "ev_funnel_conversion",
      "ev_retention_cohorts", "ev_value_outliers", "dq_profile_orders",
      "txt_dup_ngrams", "dedup_window_spans", "dedup_remove_spans",
      "pipeline_decontaminate_bloom", "pipeline_dsir_select",
      "stat_poisson_bootstrap")
    val interesting = if (args.length > 1) args.drop(1).toSeq else defaultList
    interesting.foreach { name =>
      println(s"\n===== $name =====")
      println(Queries.queriesMap(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
