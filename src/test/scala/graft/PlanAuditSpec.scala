package graft

/** Whole-registry physical-plan audit — the "would this survive 100×"
  * check as an executable gate over every SparkEntry query:
  *
  *  - No CartesianProduct anywhere, ever.
  *  - BroadcastNestedLoopJoin only where one side is provably tiny or
  *    the all-pairs shape is the operator's intent (allow-listed below
  *    with the reason); anywhere else it means an equi-join key was
  *    lost and the query would melt at scale.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose BNLJ is by design, with the bounded side. */
  private val bnlAllowed: Map[String, String] = Map(
    "ea9_above_avg_error_users" -> "cross join against a 1-row global aggregate",
    "ea11_anomalous_hours" -> "cross join against a 1-row global average",
    "tx9_fraud_ratio_outliers" -> "cross join against a 1-row global rate",
    "ann_cosine_topk" -> "brute-force baseline: tiny broadcast query side (nQueries=5)",
    "ann_filtered_topk" -> "filtered brute-force: tiny broadcast query side (nQueries=5)",
    "ann_hybrid_rrf" -> "dense arm's brute-force broadcast query side + 1-row stats side",
    "dd_embed_pairs" -> "exact all-pairs oracle baseline (scale path is dd_embed_neardup)",
    "ea17_kmv_overlap" -> "non-equi pair join over two 5-row sketch aggregates",
    "txt_cms_terms" -> "cross join against a 1-row global CMS sketch",
    "txt_bm25_topk" -> "cross join against a 1-row corpus-stats side",
    "txt_unigram_logprob" -> "cross join against a 1-row token-total side",
    "txt_bigram_logprob" -> "cross join against a 1-row token-total side",
    "txt_tfidf_topterms" -> "cross join against a 1-row doc-count side",
    "txt_curation_report" -> "cross join against a 1-row token-total side (unigram signal)",
    "txt_final_corpus" -> "inherits the curation verdicts' 1-row token-total cross join (unigram signal)",
    "ann_mmr_rerank" -> "candidate gen is the brute-force broadcast query side (nQueries=5)",
    "txt_dynamic_threshold" -> "cross join against a 1-row token-total side (unigram signal)",
    "txt_mixture_weights" -> "cross joins against 1-row token-total and normalizer sides",
    "ea18_funnel" -> "report row = cross join of three 1-row stage aggregates",
    "q24_lapsed_customers" -> "cross join against the 1-row global balance threshold",
    "tx13_rate_intervals" -> "cross join against the 1-row max-activity-date bound",
    "tx14_interval_join" -> "range join against the broadcast O(#publications) interval dimension",
    "tx16_bucketed_interval" -> "inherits tx13's cross join against the 1-row max-activity-date bound (the interval JOIN itself is the bucket equi-join under audit)",
    "dd_sim_calibration" -> "sample-bounded all-pairs calibration (vec_id % 10 sample by construction)",
    "q29_important_parts" -> "cross join against the 1-row global total/count side",
    "dd_triangles" -> "cross joins of three 1-row census aggregates",
    "txt_source_entropy" -> "cross join against the 1-row corpus-total side",
    "ann_pca_topk" -> "coarse phase broadcasts the tiny projected query side (nQueries=5)")

  /** Queries whose single-partition exchange is over a frame that is
    * SMALL BY CONSTRUCTION (the same boundedness argument as
    * [[bnlAllowed]]): a global window over a pre-aggregated or
    * dimension-sized input funnels O(groups)/O(dim) rows through one
    * task, not the fact table. */
  private val singlePartitionAllowed: Map[String, String] = Map(
    "q31_spend_quartiles" -> ("global ntile over the pre-aggregated " +
      "O(customers) spend table — equal-population quartiles are a total order"),
    "tx11_vnd_asof_gapfill" -> "ignoreNulls last() window over the O(#days) rate dimension",
    "tx13_rate_intervals" -> "lead() window over the O(#publications) rate dimension",
    "tx14_interval_join" -> "inherits tx13's dimension-sized interval build",
    "tx16_bucketed_interval" -> "inherits tx13's dimension-sized interval build")

  /** Queries whose registered frame is a DRIVER-LOCAL result — the
    * distributed work runs during construction (BPE training's
    * per-round agg + TakeOrderedAndProject jobs) and the returned plan
    * is a LocalRelation that cannot contain a join: auditing it would
    * execute the full algorithm to assert nothing. Their distributed
    * round shapes are gated by their specs instead. */
  private val localResult: Set[String] = Set("txt_bpe_merges")

  SparkEntry.queries.toSeq.sortBy(_._1)
    .filterNot { case (name, _) => localResult(name) }
    .foreach { case (name, fn) =>
    test(s"plan audit: $name") {
      // the audit IS the productized linter (graft.plans.PlanLint) —
      // the user-facing API and the registry gate can never drift
      val df = fn(spark, sf)
      val findings = graft.plans.PlanLint.lint(df)
      def plan = df.queryExecution.executedPlan.toString
      assert(!findings.exists(_.kind == "cartesian"),
        s"$name plans a cartesian product:\n$plan")
      if (!bnlAllowed.contains(name)) {
        assert(!findings.exists(_.kind == "bnl-join"),
          s"$name plans a nested-loop join without an allow-list reason:\n$plan")
      }
      // no registered query may funnel the dataset through one task
      // (partial-aggregate / local-limit exchanges are exempt in the
      // linter — those ship buffers, not data; dimension-sized global
      // windows are allow-listed above with the boundedness reason)
      if (!singlePartitionAllowed.contains(name)) {
        assert(!findings.exists(_.kind == "single-partition-exchange"),
          s"$name funnels through a single-partition exchange:\n$plan")
      }
    }
  }
}
