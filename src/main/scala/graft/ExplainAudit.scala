package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries — the
  * plan-quality feedback loop: verify predicate pushdown reaches the parquet
  * scan (PushedFilters), column pruning (ReadSchema), broadcast joins where
  * a side is small, and wide WholeStageCodegen spans.
  * Usage: runMain graft.ExplainAudit [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("p14_pipeline", "q05_broadcast", "d03_lsh_pairs", "p06_parse_zeek",
        "e02_top_purchasers", "a04_ann_sketch", "g02_dns", "p27_netflow_v9",
        "d10_decontaminate", "d12_repeat_substr", "t09_curation_gate",
        "i03_kmeans", "q08_asof_enrich", "q09_range_enrich", "s02_countmin",
        "p30_netflow_v9_typed", "p31_netflow_v9_options_typed", "k01_pack",
        "f03_pcap_scan", "s04_bloom_decontam", "k11_len_batches",
        "a05_ann_hamming", "p32_netflow_v9_resume", "k12_temp_mix",
        "i05_hard_negatives", "k13_strat_sample", "t11_substr_novelty",
        "a06_ann_pq", "a07_ann_ivfpq", "d14_dup_spans", "t12_gopher_rules",
        "d16_cluster_canon", "i06_bm25", "t13_keywords", "m04_media_neardup",
        "k14_apply_vocab", "d17_line_dedup", "d18_source_overlap",
        "d19_clusters_verbatim", "p33_netflow_v9_compat", "k15_dsir",
        "d20_soft_dedup", "t15_ppl_buckets", "i07_mmr", "i08_rrf",
        "d21_contam_rate", "d22_allpairs", "s05_kmv_distinct", "i09_ann_recall",
        "i10_retrieve_rerank", "k16_epoch_schedule", "i11_ivf_balance", "k17_bpe_train", "t16_chunks", "k18_bpe_segments", "i12_cluster_quality")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
