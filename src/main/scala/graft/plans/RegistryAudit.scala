package graft.plans

import org.apache.spark.sql.DataFrame

/** The registered-query plan-audit POLICY — [[PlanLint]]'s findings
  * plus the per-query exemptions, kept in ONE place so the test-scale
  * gate ([[graft.PlanAuditSpec]], every registered query at spec
  * scale) and the bench-scale gate ([[graft.Bench]], every query's
  * EXECUTED plan at the benched scale, after AQE has replanned —
  * VERDICT r6 #6) can never drift: a query is exempt from a finding
  * kind only here, with the boundedness reason on record.
  *
  * Exemptions are (query → reason) maps, not bare sets, because every
  * exemption is an ARGUMENT: the flagged shape is provably bounded (a
  * 1-row aggregate side, a dimension-sized window, a deterministic
  * sample) — a reviewer reads the reason, not the plan.
  */
object RegistryAudit {

  /** Queries whose BroadcastNestedLoopJoin is by design, with the
    * bounded side. */
  val bnlAllowed: Map[String, String] = Map(
    "ea9_above_avg_error_users" -> "cross join against a 1-row global aggregate",
    "ea11_anomalous_hours" -> "cross join against a 1-row global average",
    "tx9_fraud_ratio_outliers" -> "cross join against a 1-row global rate",
    "ann_cosine_topk" -> "brute-force baseline: tiny broadcast query side (nQueries=5)",
    "ann_filtered_topk" -> "filtered brute-force: tiny broadcast query side (nQueries=5)",
    "ann_hybrid_rrf" -> "dense arm's brute-force broadcast query side (the r9 lex-index memo removed the old 1-row stats cross join)",
    "ann_hybrid_rrf_stored" -> "same dense arm as ann_hybrid_rrf (brute-force broadcast query side); the stored-postings lexical arm adds only equi-joins",
    "dd_embed_pairs" -> "sample-bounded exact baseline (vec_id % 10 slice by construction; scale path is dd_embed_neardup)",
    "ea17_kmv_overlap" -> "non-equi pair join over two 5-row sketch aggregates",
    "txt_cms_terms" -> "cross join against a 1-row global CMS sketch",
    "dd_bloom_delta" -> "cross join against the 1-row corpus Bloom-filter sketch",
    "txt_bm25_topk" -> "cross join against a 1-row corpus-stats side",
    "txt_unigram_logprob" -> "cross join against a 1-row token-total side",
    "txt_bigram_logprob" -> "cross join against a 1-row token-total side",
    "txt_tfidf_topterms" -> "cross join against a 1-row doc-count side",
    "txt_curation_report" -> "cross join against a 1-row token-total side (unigram signal)",
    "txt_final_corpus" -> "inherits the curation verdicts' 1-row token-total cross join (unigram signal)",
    "ann_mmr_rerank" -> "candidate gen is the brute-force broadcast query side (nQueries=5)",
    "txt_dynamic_threshold" -> "cross join against a 1-row token-total side (unigram signal)",
    "txt_dsir_weights" -> "cross join against the 1-row corpus/target totals side",
    "txt_mixture_weights" -> "cross joins against 1-row token-total and normalizer sides",
    "ea18_funnel" -> "report row = cross join of three 1-row stage aggregates",
    "q24_lapsed_customers" -> "cross join against the 1-row global balance threshold",
    "tx13_rate_intervals" -> "cross join against the 1-row max-activity-date bound",
    "tx14_interval_join" -> "range join against the broadcast O(#publications) interval dimension",
    "tx16_bucketed_interval" -> "inherits tx13's cross join against the 1-row max-activity-date bound (the interval JOIN itself is the bucket equi-join under audit)",
    "dd_sim_calibration" -> "sample-bounded all-pairs calibration (vec_id % 10 sample by construction)",
    "dd_semantic_contamination" -> "sample-bounded exact cross-split baseline (vec_id % 10 slice by construction; scale path is dd_semantic_contamination_lsh)",
    "q29_important_parts" -> "cross join against the 1-row global total/count side",
    "dd_triangles" -> "cross joins of three 1-row census aggregates",
    "txt_source_entropy" -> "cross join against the 1-row corpus-total side",
    "ann_pca_topk" -> "coarse phase broadcasts the tiny projected query side (nQueries=5)",
    "txt_langid_trained" -> ("per-doc totals cross the broadcast O(#languages) class dimension - argmax needs a score per class incl. zero-hit languages; the trigram-sized work is the preceding bucket equi-join"))

  /** Queries whose single-partition exchange is over a frame that is
    * SMALL BY CONSTRUCTION (the same boundedness argument as
    * [[bnlAllowed]]): a global window over a pre-aggregated or
    * dimension-sized input funnels O(groups)/O(dim) rows through one
    * task, not the fact table. */
  val singlePartitionAllowed: Map[String, String] = Map(
    "tx11_vnd_asof_gapfill" -> "ignoreNulls last() window over the O(#days) rate dimension",
    "tx13_rate_intervals" -> "lead() window over the O(#publications) rate dimension",
    "tx14_interval_join" -> "inherits tx13's dimension-sized interval build",
    "tx16_bucketed_interval" -> "inherits tx13's dimension-sized interval build",
    "txt_train_order" -> ("bucket-offset window over the CONSTANT 256-row " +
      "2-hex-digit bucket rollup - dimension-sized by construction, never " +
      "corpus-scaled; the corpus-sized ranks run partitioned by bucket"))

  /** Queries whose registered frame is a DRIVER-LOCAL result — the
    * distributed work runs during construction (BPE training's
    * per-round agg + TakeOrderedAndProject jobs) and the returned plan
    * is a LocalRelation that cannot contain a join: auditing it would
    * execute the full algorithm to assert nothing. Their distributed
    * round shapes are gated by their specs instead. */
  val localResult: Set[String] = Set("txt_bpe_merges")

  /** The findings for `name` that no exemption covers — empty means
    * the query passes the registry policy. Safe on both compiled and
    * executed frames ([[PlanLint]] reads through AQE roots either
    * way, so a post-execution call audits the FINAL adaptive plan). */
  def unexempt(name: String, df: DataFrame): Seq[PlanLint.Finding] =
    if (localResult(name)) Seq.empty
    else PlanLint.lint(df).filter { f =>
      f.kind match {
        case "bnl-join" => !bnlAllowed.contains(name)
        case "single-partition-exchange" => !singlePartitionAllowed.contains(name)
        case _ => true // cartesian (and any future kind): never exempt
      }
    }
}
