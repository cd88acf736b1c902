package graft.queries

import graft.SparkSpec

/** Pins the PHYSICAL plans the scale story depends on — a regression here
  * means a future change silently traded away pushdown, top-k, or a
  * broadcast (SURVEY.md §4: these rewrites are the point of being
  * declarative).
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf())
      .queryExecution.executedPlan.toString

  test("filter and projection reach the parquet scan") {
    val p = plan("q_p6_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), IsNotNull(o_totalprice)"))
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string," +
      "o_totalprice:double,o_orderpriority:string>"))
    assert(!p.contains("o_custkey"), "scan reads columns the query never uses")
  }

  test("global top-k plans as TakeOrderedAndProject, never a full sort") {
    assert(plan("q_t1_topk").contains("TakeOrderedAndProject"))
  }

  test("star joins broadcast every dimension") {
    assert("BroadcastHashJoin".r.findAllIn(plan("q_join_revenue_by_nation")).size >= 3)
    assert("BroadcastHashJoin".r.findAllIn(plan("q_parts_by_supplier_nation")).size >= 3)
  }

  test("semi and anti joins keep their physical join types") {
    assert(plan("q_join_semi").contains("LeftSemi"))
    assert(plan("q_join_anti").contains("LeftAnti"))
  }

  test("shuffle-hash hint reaches the physical plan (hints are requests)") {
    assert(plan("q_join_shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("equi+range join never degrades to a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoop"))
    assert(!p.contains("CartesianProduct"))
  }

  test("tf-idf broadcasts the vocabulary-sized df table") {
    assert(plan("q_text_tfidf").contains("BroadcastHashJoin"))
  }

  test("histogram reads only the binned column") {
    val p = plan("q_histogram")
    assert(p.contains("ReadSchema: struct<o_totalprice:double>"))
  }

  test("unpivot melts in the scan stage, no extra shuffle") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"))
    // exactly one exchange pair: the 4-group aggregation (plus the sort)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1)
  }

  test("bloom prefilter evaluates on the fact side below the join") {
    val p = plan("q_bloom_prejoin")
    val might = p.indexOf("might_contain")
    assert(might >= 0, "the sketch filter must survive into the physical plan")
    // the filter sits in the fact scan stage — i.e. BEFORE the first join
    // operator in the plan string (plans print top-down, join above scans)
    val join = p.indexOf("Join")
    assert(join >= 0 && join < might,
      "might_contain must be under the join, prefiltering the fact scan")
  }

  test("exact SSJ rescore runs on the native sorted-merge intersect kernel") {
    val p = plan("q_dedup_ngram_jaccard")
    assert(p.contains("graft_sorted_intersect_count"),
      "rescore regressed off the native kernel")
    assert(!p.contains("array_intersect"), "string intersection reappeared")
  }

  test("fuzzy join: broadcast candidate equi-join, never a cartesian") {
    val p = plan("q_fuzzy_join")
    assert(p.contains("BroadcastHashJoin"),
      "the small probe side must broadcast into the deletion-key join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "fuzzy matching must go through the SymSpell candidate keys, not all-pairs")
  }

  test("curation verdict: one fused text scan; dup via window; cont broadcast") {
    val p = plan("q_curate_verdict")
    // r12 fusion: the three row-local gates AND the exact-dup fingerprint
    // come out of ONE projection over the corpus text; the canonical pick
    // is a window over f (no join-back), so the only join left is the
    // broadcast contamination semi-join family. The corpus text is read
    // exactly once: documents scans = fused scan + shingle side + bench.
    assert(p.contains("Window"), "exact-dup canonical pick must be a window over f")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    val scans = "Scan parquet|FileScan parquet".r.findAllIn(p).size
    assert(scans <= 3,
      s"verdict grew extra corpus scans ($scans):\n${p.take(1500)}")
  }

  test("NOT IN with nullable subquery plans as a null-aware anti join") {
    val p = plan("q_not_in_nulls")
    // Spark's only safe distributed strategy for null-aware NOT IN
    assert(p.contains("LeftAnti BuildRight, ((c_custkey") ||
      p.contains("ExistenceJoin") || p.contains("LeftAnti, ((c_custkey") ||
      ("LeftAnti".r.findAllIn(p).size >= 2),
      s"expected null-aware + plain anti joins in:\n${p.take(2000)}")
  }

  test("media decodes shuffle once (the explicit repartition) then stay row-local") {
    // decode is a projection fold: beyond the byte-proportional repartition
    // and the dump's final sort, no exchange may appear — incl. every
    // round-10 codec path (fixed/dynamic deflate, JPEG entropy decode)
    Seq("q_mm_audio", "q_mm_pixels", "q_mm_png_pixels_fh",
      "q_mm_png_pixels_dyn", "q_mm_jpeg_pixels").foreach { q =>
      val p = plan(q)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 3, // repartition + sort's range partitioning (+AQE read)
        s"$q grew extra shuffles ($exchanges):\n${p.take(1500)}")
      assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    }
  }

  test("PQ family: kernel in the plan, broadcast LUT joins, no all-pairs") {
    val enc = plan("q_embed_pq")
    // the compiled argmin actually plans (no literal-tree fallback), and
    // encoding stays a scan: only the final dump sort may shuffle
    assert(enc.contains("pq_argmin"), "PqArgmin kernel missing from the encode plan")
    assert("Exchange".r.findAllIn(enc).size <= 2,
      s"PQ encode grew shuffles:\n${enc.take(1500)}")
    Seq("q_sim_ann_pq", "q_sim_ann_ivfpq").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast LUT join")
      // the only nested loops allowed are the <=16-row centroid
      // cross-scores (the q_sim_ann_ivf shape); every one must be a
      // BROADCAST nested loop, and a true cartesian is always a bug
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian")
      val bnl = "BroadcastNestedLoop".r.findAllIn(p).size
      assert(bnl <= 2, s"$q grew unexpected nested loops ($bnl)")
    }
  }

  test("bottom-k containment probes via a hash equi-join, never a nested loop") {
    val p = plan("q_dedup_containment_bottomk")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  test("bm25 keeps top-k physical and broadcasts the corpus statistics") {
    val p = plan("q_text_bm25")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must never be a full sort")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1, p.take(1200))
    assert("BroadcastNestedLoop".r.findAllIn(p).size >= 2, // the two scalar cross joins
      s"scalars (N, avgdl) must broadcast:\n${p.take(1200)}")
  }

  test("sequence packing windows and aggregates on the shard key, no global sort before agg") {
    val p = plan("q_pack_sequences")
    // the window is partitioned (never a WindowExec over one partition):
    // its sort must be (source, doc_id) within hash-partitioned shards
    assert(p.contains("Window"), p.take(800))
    assert(p.contains("hashpartitioning(source"),
      s"window/agg must be keyed by the shard:\n${p.take(1500)}")
  }

  test("MAD outlier passes broadcast the per-group medians, never shuffle the facts twice") {
    val p = plan("q_outlier_mad")
    // both med and (med,mad) rejoins are group-key-sized → broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(1500))
    assert(!p.contains("SortMergeJoin"),
      s"fact-side rejoin must not shuffle the fact table:\n${p.take(1500)}")
  }

  test("attribution is one user-keyed window shuffle, no join anywhere") {
    val p = plan("q_attribution")
    assert(p.contains("hashpartitioning(user_id"), p.take(1200))
    assert(!p.contains("Join"), s"attribution must be pure window+agg:\n${p.take(1200)}")
  }

  test("kNN audit broadcasts the probe side into the scoring scan") {
    val p = plan("q_embed_knn_audit")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
  }

  test("rrf takes both candidate lists as physical top-k before fusing") {
    val p = plan("q_text_rrf")
    assert("TakeOrderedAndProject".r.findAllIn(p).size >= 3, // 2 lists + final
      s"every ranking cut must be top-k, never a full sort:\n${p.take(1500)}")
  }

  test("source mixing broadcasts the per-source stats back into the keep scan") {
    val p = plan("q_mix_sources")
    // the normalizer and per-source probabilities are dimension-table
    // sized: the doc-scale side must see them as broadcasts, never a
    // fact-fact shuffle join
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"stats frames must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"no doc-scale shuffle join in the mix decision:\n${p.take(1500)}")
  }

  test("drift PSI broadcasts the per-type totals, never a fact-side shuffle join") {
    val p = plan("q_drift_psi")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("containment and substring joins never degrade to a cartesian") {
    Seq("q_dedup_containment", "q_dedup_substring").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"$q grew a product join:\n${p.take(1200)}")
    }
  }

  test("hard-negative mining: one qid exchange serves both margin and rank windows") {
    val p = plan("q_embed_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("CartesianProduct"))
    // both window passes (positive-margin max, negative row_number) must
    // reuse one hashpartitioning(qid) exchange
    assert("hashpartitioning\\(qid".r.findAllIn(p).size <= 2,
      s"windows re-shuffled the scored stream:\n${p.take(1500)}")
  }
}
