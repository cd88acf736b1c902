package graft

/** Driver-contract invariants: SparkEntry is the single surface the driver
  * sees, and a silent mistake here (a duplicate query name shadowing an
  * operator in the Map, an oracle keyed to a nonexistent query) would drop
  * gate rows without any compile error.
  */
class ContractSpec extends SparkSpec {

  test("no two queries share a name (Map construction would shadow one)") {
    val names = Seq(
      graft.queries.Relational.all, graft.queries.Windows.all,
      graft.queries.Scalars.all, graft.queries.Skew.all,
      graft.queries.Analytics.all, graft.text.TextAnalysis.all,
      graft.queries.Curation.all, graft.queries.Fuzzy.all,
      graft.dedup.Dedup.all, graft.similarity.Similarity.all,
      graft.multimodal.Multimodal.all, graft.ml.QualityModel.all,
    ).flatten.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct}")
    // the assembled map carries every module query plus the three etl dumps
    assert(SparkEntry.queries.size === names.size + 3)
  }

  test("every oracle belongs to a declared query, none are blank") {
    val qs = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql
    assert(oracles.keySet.subsetOf(qs))
    assert(oracles.values.forall(_.trim.nonEmpty))
    // rows-only set stays intentional: exactly the probabilistic sketches
    // and their round-10 compositions (each pinned against its exact twin
    // in DedupSpec/CurationSpec/SimilaritySpec instead of DuckDB)
    assert(qs -- oracles.keySet === Set(
      "q_approx_distinct", "q_approx_quantiles", "q_dedup_minhash_lsh",
      "q_dedup_simhash", "q_dedup_clusters_lsh", "q_sim_ann_lsh",
      "q_sim_ann_ivf",
      "q_dedup_containment_sketch", "q_dedup_containment_bottomk",
      // r13: the symmetric bottom-k twin — same estimator family as the
      // containment row above, precision-1 by exact rescore, recall pinned
      // vs the exact PPJoin twin in DedupSpec (no new unchecked surface)
      "q_dedup_jaccard_bottomk",
      "q_dedup_canonical_lsh",
      "q_split_leakage_safe_lsh", "q_curate_verdict_lsh",
      "q_embed_pca", "q_embed_pq", "q_sim_ann_pq", "q_sim_ann_ivfpq",
      "q_sim_ann_ivfpq_res", "q_pipeline_e2e_lsh",
      // r11: the persisted-index serving twin of q_sim_ann_ivfpq — pinned
      // bit-equal to it in SimilaritySpec, so no new unchecked surface
      "q_sim_ann_ivfpq_idx"))
  }
}
