package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: SCALE.md's claims about what each operator
  * class compiles to are asserted here, so a refactor that silently
  * de-optimizes a plan (loses a pushdown, turns a broadcast into a
  * shuffle, reintroduces a window into the IVF assignment) fails CI
  * rather than only showing up in a bench run. String-level checks on
  * the physical plan keep the assertions robust across Spark versions —
  * operator presence/absence, not exact trees.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  private def countOf(hay: String, needle: String): Int =
    needle.r.findAllMatchIn(hay).length

  test("q03: filter and projection reach the parquet scan") {
    val p = plan("q03_filter_pushdown")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    // pruned read: the scan schema must not include every lineitem column
    assert(!p.contains("l_comment"), p)
  }

  test("q278/q110: hex spans ride the native HexSpanVal, not instr-per-digit") {
    // the r13 swap: the SQL macro costs `len` instr(substr(...)) string
    // expressions per span per row (26/row on q278, one per exploded
    // token on q110) — the native form must survive refactors
    for (name <- Seq("q278_merkle_diff", "q110_sparse_cosine")) {
      val p = plan(name)
      assert(p.contains("hex_span_val"), s"$name lost the native span:\n$p")
      assert(!p.contains("instr("),
        s"$name re-grew instr-per-digit span extraction:\n$p")
    }
  }

  test("q04/q05: dimension joins broadcast; the fact side never shuffles for them") {
    assert(plan("q04_join_broadcast").contains("BroadcastHashJoin"))
    assert(plan("q05_join_multi").contains("BroadcastHashJoin"))
  }

  test("q16/q38: global top-k plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("q16_topk_global").contains("TakeOrderedAndProject"))
    assert(plan("q38_cosine_topk").contains("TakeOrderedAndProject"))
  }

  test("q24: as-of join costs exactly one data shuffle (the key window)") {
    val p = plan("q24_asof_join")
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("q56: IVF assignment is scan-side — no window, no corpus shuffle") {
    val p = plan("q56_ann_ivf")
    assert(!p.contains("Window"), p)
    // the only hash exchanges are the tiny centroid-packing aggregations
    // (16-row side), one per packCentroids call — never the corpus
    assert(countOf(p, "Exchange hashpartitioning") <= 2, p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q57: trained centroids are a LocalRelation — training lineage never re-executes") {
    // trainCentroids collapses each Lloyd's result (k×dim doubles) into a
    // local frame; the serving plan must read centroids from a
    // LocalTableScan and keep the q56 scan-side shape — a corpus-sized
    // re-execution of the training loop would reappear here as extra
    // exchanges/aggregates over the embeddings scan
    val p = plan("q57_ann_ivf_trained")
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("Window"), p)
    assert(countOf(p, "Exchange hashpartitioning") <= 2, p)
    // serving reads the embeddings table twice (corpus + query probe),
    // never more — a re-run of training would add full-table scans
    assert(countOf(p, "FileScan parquet").max(countOf(p, "Scan parquet")) <= 2, p)
  }

  test("q238: ring assignment is scan-side — no window, no join, no per-key shuffle") {
    // both consistent-hash rings are driver-computed constants inside
    // the native RingOwner expression (binary search per key), so the
    // plan has NO join of any kind and the only hash exchange is the
    // final 20-group movement-matrix aggregation
    val p = plan("q238_shard_resize")
    assert(!p.contains("Window"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ring_owner"), p)
  }

  test("q78: PQ encode is scan-side; serving is broadcast joins + top-k") {
    // the per-subspace argmin folds run in the scan (no window, no corpus
    // shuffle); ADC reconstruction is m tiny broadcast joins; final top-k
    // is TakeOrderedAndProject
    val p = plan("q78_pq_adc")
    assert(!p.contains("Window"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 0, p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(countOf(p, "BroadcastHashJoin") >= 4, p)
  }

  test("q47: salted aggregation is two-phase (salted then merged)") {
    val p = plan("q47_salted_agg")
    assert(countOf(p, "Exchange hashpartitioning") == 2, p)
  }

  test("q37/q59/q60/q62: fused text ops stay scan-side (no data shuffle)") {
    // simhash values, winnowing summaries, hash splits, redaction: pure
    // per-row expressions — the only allowed exchange is the final
    // presentation orderBy (rangepartitioning), never a hash shuffle
    for (name <- Seq("q37_simhash", "q59_winnowing", "q60_hash_split", "q62_redact")) {
      val p = plan(name)
      assert(countOf(p, "Exchange hashpartitioning") == 0, s"$name:\n$p")
    }
  }

  test("q61: per-source quota is one window shuffle, rank never globalizes") {
    val p = plan("q61_source_quota")
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("q68/q69: sessionization and funnel ride ONE user-keyed shuffle") {
    // lag+cumsum (q68) and the three chained stage minima (q69) share the
    // user partitioning — a second hash exchange would mean the windows
    // stopped aligning (q69's final global agg is a single-partition agg,
    // not a hash exchange)
    assert(countOf(plan("q68_batch_sessions"), "Exchange hashpartitioning") == 1)
    assert(countOf(plan("q69_funnel"), "Exchange hashpartitioning") == 1)
  }

  test("q74/q84/q89/q90: curation plans keep their one-shuffle shapes") {
    // sequence packing: one window on source (plus the presentation sort)
    assert(countOf(plan("q74_seq_packing"), "Exchange hashpartitioning") <= 2)
    // decontamination: benchmark shingles broadcast; one hash agg on pairs
    val p84 = plan("q84_decontamination")
    assert(p84.contains("BroadcastHashJoin"), p84)
    assert(countOf(p84, "Exchange hashpartitioning") == 1, p84)
    // unigram scoring: term table broadcast back; term agg + doc agg
    val p89 = plan("q89_unigram_logprob")
    assert(p89.contains("BroadcastHashJoin"), p89)
    assert(countOf(p89, "Exchange hashpartitioning") == 2, p89)
    // z-score: the moments frame broadcasts; one group agg behind it
    val p90 = plan("q90_zscore_outliers")
    assert(p90.contains("BroadcastHashJoin"), p90)
    assert(countOf(p90, "Exchange hashpartitioning") == 1, p90)
  }

  test("q99: EXISTS/NOT EXISTS decorrelate to one semi + one anti join") {
    val p = plan("q99_exists_subquery")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(countOf(p, "BroadcastHashJoin") == 2, p)
  }

  test("q100: LATERAL with LIMIT decorrelates to a rank group-limit, not a per-row subquery") {
    val p = plan("q100_lateral_join")
    // WindowGroupLimit = the top-k-per-group pushdown; a naive plan would
    // be a nested-loop over customers
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q103: hopping windows are Expand + ONE data shuffle (no self-join)") {
    val p = plan("q103_hopping_window")
    assert(p.contains("Expand"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q105: EWMA is a window fold — no self-join anywhere") {
    val p = plan("q105_ewma")
    assert(countOf(p, "Window") >= 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q107: prefix-join verify uses the codegen'd sorted intersect") {
    val p = plan("q107_prefix_jaccard_join")
    assert(p.contains("sorted_intersect_count"), p)
  }

  test("q110: sparse retrieval broadcasts probes; the corpus index never moves for them") {
    val p = plan("q110_sparse_cosine")
    assert(countOf(p, "BroadcastHashJoin") >= 1, p)
  }

  test("q111: JPEG construct+parse is pure scan-side (zero data shuffles)") {
    val p = plan("q111_jpeg_dims")
    assert(countOf(p, "Exchange hashpartitioning") == 0, p)
    assert(p.contains("jpeg_sof_dims"), p)
  }

  test("q36: LSH signature/verify never ships raw shingle strings") {
    // the persisted signature frame carries only md5'd shingles (hs);
    // the raw token/shingle arrays must be consumed inside the scan stage
    val p = plan("q36_minhash_lsh")
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.toLowerCase.contains("sset"), p)
  }

  test("q132: bloom mask test filters the probe scan BEFORE the shuffle join") {
    val p = plan("q132_bloom_join")
    // the mask membership tests (shiftleft bit probes) must sit in a
    // Filter on the fact side, and the exact join must be the forced
    // non-broadcast merge join — the scenario where the reduction pays
    assert(p.contains("shiftleft"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q138: min/max skip joins the fact scan against a BROADCAST survivor list") {
    val p = plan("q138_minmax_prune")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q140: negative mining joins a BROADCAST anchor batch; one anchor-keyed window") {
    val p = plan("q140_negative_sampling")
    // the inequality join must ride the bounded broadcast anchor side
    // (nested-loop with a tiny build), never a shuffled theta join
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("q148: the epoch reshuffle costs exactly one window shuffle") {
    val p = plan("q148_epoch_shuffle")
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
  }

  test("q149: span dedup's canonical pick is one span-keyed window with a group-limit pushdown") {
    val p = plan("q149_span_dedup")
    // rn=1 must compile to WindowGroupLimit (partial top-1 per span ahead
    // of the shuffle) — losing it ships every span occurrence unsummarized
    assert(p.contains("WindowGroupLimit"), p)
    // span window + doc reassembly + (at most) a join-side exchange; the
    // final orderBy rangepartitioning is not counted here
    assert(countOf(p, "Exchange hashpartitioning") <= 3, p)
  }

  test("q150: semantic dedup assigns scan-side; the pairwise work is cluster-bucketed") {
    val p = plan("q150_semantic_dedup")
    // packed-centroid broadcast assignment, as q56 — never a window
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q153: the keyless interval join plans as a bin EQUI join, never a nested loop") {
    val p = plan("q153_binned_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Join") || p.contains("Hash"), p)
  }

  test("q154: join-IVM maintenance broadcasts every delta side") {
    val p = plan("q154_join_ivm")
    // ΔA⋈B, A⋈ΔB, ΔA⋈ΔB all ride broadcast deltas — maintenance must
    // never re-shuffle a base table against the view
    assert(countOf(p, "BroadcastHashJoin") >= 3, p)
  }

  test("q168: containment join is a one-sided prefix EQUI join — no nested loop") {
    val p = plan("q168_containment")
    // the candidate generator must be an equi join on the posting hash h,
    // never a cross/theta shape over the corpus
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly two posting explodes: the contained side's PREFIX slice
    // (≤ (1−t)·|A|+1 postings) and the containing side's full set — a
    // third would mean a branch re-derived its postings
    assert(countOf(p, "Generate explode") == 2, p)
    // the prefix side really is a slice, not a full-set explode
    assert(p.contains("slice("), p)
  }

  test("q171: phrase search joins only term-filtered postings — no cartesian, no window") {
    val p = plan("q171_phrase_search")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
    // the three posting lists meet on (doc_id, anchor) equi keys
    assert(p.contains("Join") && p.contains("anchor"), p)
  }

  test("q174: source influence shuffles ONLY on source — moments roll up, LOO never rescans") {
    val p = plan("q174_source_influence")
    // every hash exchange is the source-keyed moment aggregation (the
    // global rollup's branch repeats the identical exchange statically;
    // ReuseExchange executes it once) — a per-source refit or a pairwise
    // stage would appear as an exchange on some OTHER key or a window
    val hashKeys = "Exchange hashpartitioning\\(([a-zA-Z_]+)".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(hashKeys.subsetOf(Set("source")), s"$hashKeys\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q181: label cohesion scores against a BROADCAST centroid table — no window, nothing pairwise") {
    val p = plan("q181_label_cohesion")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q189: profile stays HASH-aggregated — multi-distinct rides one Expand, no SortAggregate cascade") {
    val p = plan("q189_column_profile")
    // two pruned scans (distinct-only + stats); mixing the two agg
    // families would sort the whole x4 Expand through a KEYED
    // SortAggregate. The stats branch legitimately shows a keyless
    // SortAggregate (string min/max buffers aren't hash-mutable) but
    // with no keys there is no Sort operator — assert exactly that.
    assert(countOf(p, "Scan parquet") == 2, p)
    assert(p.contains("Expand"), p)
    assert(!p.contains("SortAggregate(key=[l_"), p)
    // the only Sort is the 4-row output ordering above stack()
    assert(countOf(p, "- Sort \\[") == 1, p)
  }

  test("q190: both window specs AND the scorecard agg share ONE source shuffle") {
    val p = plan("q190_budget_fill")
    // the per-source total window, the priority-ordered running sum, and
    // the final groupBy(source) all ride the same hashpartitioning(source)
    // exchange; the only other exchange is the final presentation sort
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(countOf(p, "Window") == 2, p)
  }

  test("q197: first and last touch ride ONE user shuffle and ONE Window node") {
    val p = plan("q197_attribution")
    // min(pk) and max(pk) share the range-frame spec, so they compile
    // into a single Window over one hashpartitioning(user_id) exchange;
    // the channel matrix agg re-shuffles only ≤25 groups
    assert(countOf(p, "Window") == 1, p)
    assert(countOf(p, "Exchange hashpartitioning\\(user_id") == 1, p)
  }

  test("q202/q204: rank cumulation runs on the aggregated score grid, not raw rows") {
    // the Mann-Whitney / ECDF windows must sit ABOVE the score-keyed
    // hash aggregation: one scan, one row-scale shuffle; the
    // single-partition sort touches only the bounded 2-decimal grid
    for (name <- Seq("q202_auc", "q204_ks_test")) {
      val p = plan(name)
      assert(countOf(p, "Scan parquet") == 1, p)
      assert(p.contains("Window"), p)
      // exactly one row-scale shuffle (the score-keyed agg); the
      // SinglePartition exchange below the window moves only the grid
      assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    }
  }

  test("q206: the day-lag self-join broadcasts the tiny day table") {
    val p = plan("q206_acf")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q208: Spearman has NO global row sort — ranks come from per-grid windows") {
    val p = plan("q208_spearman")
    // every Sort in the plan orders a grid column `v` (the post-agg
    // distinct-value frames); a Sort over raw row columns would be the
    // classic global-rank scale-killer
    assert(countOf(p, "- Sort \\[v#") == countOf(p, "- Sort \\["), p)
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q136: batched IVF keeps scan-side assignment; probes broadcast; corpus never hash-shuffles") {
    val p = plan("q136_ann_ivf_batch")
    // corpus assignment stays the packed-broadcast scan (as q56) and the
    // probe list joins in as a broadcast; the ONLY hash exchanges allowed
    // are the two tiny centroid-packing aggregations plus the candidate
    // window's qid partition — never the corpus scan itself
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(countOf(p, "Exchange hashpartitioning") <= 3, p)
  }

  test("q220: Gram moments come from ONE corpus pass; all joins broadcast") {
    // the corpus is read exactly once (the mapPartitions moments scan is
    // materialized by localCheckpoint, so the executed plan reads the
    // per-partition summary rows); pair-index/dim/total attachment must
    // all broadcast — a hash shuffle of anything corpus-shaped here
    // would mean the row-expansion regression came back
    val p = plan("q220_dim_corr")
    assert(!p.contains("FileScan parquet") && !p.contains("Scan parquet"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q225/q227: survival and seasonal windows run on aggregated grids, not rows") {
    // KM: the only unpartitioned Sorts/Windows order the ≤span-sized day
    // grid AFTER the (dur_days) hash agg; seasonal: the dense grid join
    // broadcasts and the baseline re-enters as a broadcast
    val p225 = plan("q225_kaplan_meier")
    assert(p225.contains("Window"), p225)
    assert(countOf(p225, "Exchange hashpartitioning") <= 3, p225)
    val p227 = plan("q227_seasonal_anomaly")
    assert(p227.contains("BroadcastHashJoin"), p227)
    assert(p227.contains("TakeOrderedAndProject"), p227)
    assert(!p227.contains("SortMergeJoin"), p227)
  }

  test("q243/q246: grid entries materialize the corpus agg once — no per-branch re-scan") {
    // both entries localCheckpoint their bounded metadata grid (sources /
    // 2×10 bins); every downstream branch (normalizer, shares, totals)
    // must read the materialized frame, never the parquet table again
    for (name <- Seq("q243_temperature_mixture", "q246_psi_drift")) {
      val p = plan(name)
      assert(!p.contains("FileScan parquet") && !p.contains("Scan parquet"),
        s"$name re-reads the corpus: $p")
    }
  }

  test("q244: pair space is term-keyed over one persisted frame — no cartesian product") {
    val p = plan("q244_vocab_overlap")
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q245: the compaction window runs on the file-stats grid, not data rows") {
    // one hash exchange (the (source, lang) size agg) before the
    // unpartitioned window — the window input is the bounded metadata
    // grid; a second hashpartitioning would mean the window moved onto
    // data rows
    val p = plan("q245_compaction_plan")
    assert(p.contains("Window"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("q254/q256: experiment and RFM readouts are one user agg + broadcasts") {
    // q254: the persisted per-user frame feeds pooled moments and
    // per-arm sums; every re-entry (theta row, moment row, boundaries)
    // must broadcast — a SortMergeJoin here would mean a user-keyed
    // frame is being shuffled for a 1-row attachment
    for (name <- Seq("q254_cuped_ab", "q256_rfm_segments")) {
      val p = plan(name)
      assert(p.contains("InMemoryTableScan"), s"$name lost the persist: $p")
      assert(!p.contains("SortMergeJoin"), s"$name shuffles for metadata: $p")
    }
  }

  test("q255: weighted sampling plans as TakeOrdered, not a global sort") {
    val p = plan("q255_weighted_sample_es")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q253: conformal threshold selection runs on the score grid") {
    // the cumulative window orders the post-agg (n_chars, count) grid;
    // the only join shapes are broadcasts of the 1-row k and threshold
    val p = plan("q253_conformal_coverage")
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("q267/q268: ranking and reach stay one-agg shapes") {
    // q267: Wilson ranking is one item hash agg + scan-side closed form
    // + TakeOrdered — a rangepartitioning Exchange would mean a global
    // sort crept in. q268: the cumulative window runs on the day grid
    // after the user min-day agg — window input is never raw events.
    val p267 = plan("q267_wilson_ranking")
    assert(p267.contains("TakeOrderedAndProject"), p267)
    assert(!p267.contains("Exchange rangepartitioning"), p267)
    val p268 = plan("q268_cumulative_reach")
    assert(p268.contains("Window"), p268)
    assert(!p268.contains("SortMergeJoin"), p268)
  }

  test("q228: HITS iterations read materialized scores — no per-iteration corpus re-scan") {
    // Graph.hits materializes via localCheckpoint at the end and persists
    // the edge frame; the executed plan may re-read edges per iteration
    // from the CACHED distinct frame (InMemoryTableScan), never the
    // parquet file more than once
    val p = plan("q228_hits")
    assert(countOf(p, "FileScan parquet").max(countOf(p, "Scan parquet")) <= 1, p)
  }

  test("q274: skyline dominance join extracts the bucket equi key — never a nested loop over rows") {
    // the in-bucket exact check must plan as a hash/sort-merge anti join
    // on the bucket key with the dominance predicate as a join condition;
    // a BroadcastNestedLoopJoin here would be the O(n²) skyline the
    // two-phase design exists to avoid
    val p = plan("q274_pareto_frontier")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q280: id minting never sorts rows globally — bucket window + broadcast offsets") {
    // the row-scale window partitions by the hash-prefix bucket; the
    // 256-row offset grid joins back as a broadcast. A SortMergeJoin or
    // a row-scale single-partition window would mean the two-phase rank
    // regressed to the global row_number it replaces.
    val p = plan("q280_id_minting")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("Window"), p)
  }

  test("q282: hamming shortlist is scan-side pack + TakeOrdered — floats only in the shortlist") {
    // sign-bit packing and hamming distance are per-row integer
    // expressions; the 32-candidate shortlist is TakeOrderedAndProject;
    // no window and no row-scale hash shuffle anywhere
    val p = plan("q282_hamming_rerank")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q311: boilerplate audit is term-keyed over one persisted shingle frame") {
    val p = plan("q311_boilerplate")
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only BroadcastNestedLoopJoins are the 1-row scalar attaches
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q312: entity matching is a broadcast block-join with the codegen'd scorer") {
    val p = plan("q312_jw_entity_match")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("jaro_winkler"), p)
  }

  test("q314: filtered-ANN candidates come from a broadcast probe join") {
    val p = plan("q314_filtered_ann")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q321: TIFF mining is scan-side — no join, expression in the scan projection") {
    val p = plan("q321_tiff_dims")
    assert(!p.contains("Join"), p)
    assert(p.contains("tiff_dims"), p)
  }

  test("q346: DSv2 pushdown reaches the generator source — range narrowed, id pruned, no Filter") {
    val p = plan("q346_gen_source")
    assert(p.contains("GenScan id=[1000,50000)"), p)
    assert(p.contains("cols=v,tag"), p)
    // no Filter OPERATOR may survive ("RuntimeFilters: []" in the scan
    // line is not one)
    assert(countOf(p, """\+- Filter""") == 0, p)
  }

  test("q362: storage-partitioned execution — aggs and join over the keyed scans use ZERO hash exchanges") {
    val p = plan("q362_spj_gen")
    // both sides aggregate directly on their KeyGroupedPartitioning scans
    // (partial+final adjacent, no exchange between); the only Exchange
    // allowed is the final 7-row orderBy's rangepartitioning. The join
    // itself may be storage-partitioned SMJ or (with reported stats) a
    // broadcast of the 7-row aggregated side — both are shuffle-free.
    assert(countOf(p, "Exchange hashpartitioning") == 0, p)
    assert(p.contains("keyed=tag"), p)
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q365: complete aggregate pushdown — no aggregate operator, closed-form scan") {
    val p = plan("q365_agg_pushdown")
    assert(p.contains("pushedAggs=[AggCount,AggMinId,AggMaxId,AggSumId]"), p)
    assert(p.contains("grouped=true"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("q366: the probe scan carries a live runtime dynamicpruning filter on id") {
    val p = plan("q366_runtime_pruned_join")
    assert(p.contains("dynamicpruningexpression(id"), p)
    // the build side must be a broadcast (reported stats) — reuse-only
    // DPP dies without it
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      p)
  }

  test("q409/q407: TPC-H shapes — Q6 is join-free with pushed date bounds; Q5 broadcasts its dims") {
    val p6 = plan("q409_tpch_q6")
    assert(!p6.contains("Join"), p6)
    // the simple plan string truncates long filter lists ("... N more
    // fields") — pin the untruncated prefix; the full list is asserted
    // by the formatted explain in SCALE.md's audit trail
    assert(p6.contains("PushedFilters: [IsNotNull(l_shipdate)"), p6)
    val p5 = plan("q407_tpch_q5")
    assert(countOf(p5, "BroadcastHashJoin") >= 2, p5)
    assert(!p5.contains("CartesianProduct"), p5)
  }

  test("q382: bottom-k sketch aggregates map-side — no window anywhere in the plan") {
    val p = plan("q382_kmv_distinct")
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate"), p) // the TopKAggregator path
  }

  test("q401: deletion-vector read is a broadcast membership test, not a row anti-join") {
    val p = plan("q401_deletion_vectors")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q438: presorted SPJ — merge join with ZERO exchange and ZERO sort") {
    // SupportsReportPartitioning removes the Exchanges;
    // SupportsReportOrdering removes the Sorts: the SMJ runs directly
    // over the two keyed generator scans. Any Exchange hashpartitioning
    // or Sort operator here means one of the two scan-time reports
    // stopped being honored.
    val p = plan("q438_presorted_join")
    assert(p.contains("SortMergeJoin"), p)
    assert(countOf(p, "Exchange hashpartitioning") == 0, p)
    assert(countOf(p, "- Sort \\[") == 0, p)
  }

  test("q447: TABLESAMPLE pushes into the source — no Sample operator survives") {
    val p = plan("q447_sample_pushdown")
    assert(p.contains("sample=[0.0,0.25,seed=42]"), p)
    assert(!p.contains("+- Sample"), p)
  }

  test("q457: OFFSET and LIMIT both vanish into the generated interval") {
    val p = plan("q457_offset_pushdown")
    assert(p.contains("id=[20000,32000)"), p)
    assert(!p.contains("Offset"), p)
  }

  test("q460: V2 AggregateFunction plans with a map-side partial") {
    // the user-supplied aggregate must distribute: partial_v2aggregator
    // below the exchange, the final v2aggregator above it — a plan that
    // funnels raw rows to one final aggregate would be the regression
    val p = plan("q460_v2_aggregate_function")
    val partials = countOf(p, "partial_v2aggregator\\(")
    val finals = countOf(p, "(?<!partial_)v2aggregator\\(")
    assert(partials >= 1 && finals >= 1, s"partials=$partials finals=$finals\n$p")
  }

  test("q350/q345/q354: VERDICT r10 fixes — no global rank window, no raw-row sort") {
    // all three previously ranked ROW-SCALE frames through one
    // unpartitioned row_number; they now select exact order statistics
    // from histograms (n_ev grid / h grid / x≤65536 grid), so row_number
    // must be gone entirely and no Sort may order a row-identity column
    val p350 = plan("q350_conditional_quantiles")
    assert(!p350.contains("row_number"), p350)
    assert(!"Sort \\[[^\\]]*user_id".r.findFirstIn(p350).isDefined, p350)
    val p345 = plan("q345_ppl_filter_plan")
    assert(!p345.contains("row_number"), p345)
    assert(!"Sort \\[[^\\]]*doc_id".r.findFirstIn(p345).isDefined, p345)
    val p354 = plan("q354_hash_uniformity")
    assert(!p354.contains("row_number"), p354)
    assert(!"Sort \\[[^\\]]*user_id".r.findFirstIn(p354).isDefined, p354)
  }

  test("q388: pair join blocks on the compound (nation, name-prefix) key") {
    // VERDICT r10 #4: nation alone is a FIXED 25-value key (Σ block² =
    // Θ(n²/25)); the compound key's cardinality grows with n, so the
    // join keys must include the prefix column — losing it silently
    // reverts the quadratic block
    val p = plan("q388_fellegi_sunter")
    assert(p.contains("blk"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q345: two-phase bucketed prefix-sum; q350 windows frame-fused; q356 scans events once") {
    // VERDICT r11 #1: q345's h-grid cumsum now runs the q280/q159
    // 256-bucket device — the in-bucket cumsum is PARTITIONED by bucket,
    // and the only unpartitioned window is the 256-row offset grid
    val p345 = plan("q345_ppl_filter_plan")
    assert(p345.contains("windowspecdefinition(bucket#"), p345)
    // VERDICT r11 #7: wcum + wall over the same ordering must plan as ONE
    // Window exec per grid (CollapseWindow fuses same partition+order
    // specs) — q350 = n_ev grid node + quintile grid node, exactly 2
    val p350 = plan("q350_conditional_quantiles")
    assert(countOf(p350, "(?m)^\\s*[+:]- Window") +
      countOf(p350, "(?m)^\\s*Window") <= 2, p350)
    // r12: q356's branch fan-out (b × dd × curve/tot × gaps/best) used to
    // replay the events SCAN 8×; with the histogram persisted every
    // branch must read the cache — zero raw parquet relations outside
    // the one InMemoryRelation (whose printed innerChildren would fool a
    // string count, so collect typed nodes on the optimized plan)
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    val op356 = SparkEntry.queries("q356_capture_knee")(spark, sfDir)
      .queryExecution.optimizedPlan
    val raw = op356.collect { case l: LogicalRelation => l }.size
    val mem = op356.collect { case r: InMemoryRelation => r }
      .map(_.canonicalized).distinct.size
    assert(raw == 0 && mem == 1, s"raw=$raw cached=$mem\n$op356")
    spark.catalog.clearCache()
    operators.PlanCache.releaseAll()
  }

  /** Catalog-wide window-discipline sweep (VERDICT r10 #6).
    *
    * An unpartitioned Window moves its ENTIRE input to one partition —
    * the canonical scale-killer. The repo discipline: such windows are
    * legal only above a bounded post-agg GRID (value histograms, bucket
    * offset tables, day/threshold grids), never above row-scale frames.
    * This sweep walks every catalog entry's OPTIMIZED plan and fails if
    * an unpartitioned Window appears in an entry not on the explicit
    * allowlist — so the q345/q350/q354 class of miss (three row-scale
    * global sorts that survived two manual audits) becomes a test
    * failure at introduction time, not a round-N verdict finding.
    *
    * Every allowlisted entry must ALSO satisfy the grid property
    * structurally: below the unpartitioned Window an Aggregate (or
    * bounded leaf) must sit on every path to a source relation — i.e.
    * the window input is a post-aggregation grid, not raw rows.
    *
    * Since r12 (VERDICT r11 #1) each allowlist entry also carries its
    * CARDINALITY BOUND CLASS, and the sweep EXECUTES every allowlisted
    * unpartitioned window's input and asserts its row count against the
    * class cap — so a "grid" that is secretly corpus-cardinality (e.g.
    * a window over distinct raw doubles) fails here, not in a verdict:
    *  - FixedK(k): ≤ a hard compile-time constant (bucket-offset grids,
    *    deciles, contingency tables) — asserted at exactly k;
    *  - CalendarGrid: grows with the corpus TIME SPAN only (day/week
    *    grids) — asserted at the test-scale cap below;
    *  - ValueGrid: value-range × fixed precision (2-decimal grids,
    *    integer-cent histograms, count-of-counts) — saturates at a
    *    scale-independent constant; asserted at the test-scale cap;
    *  - GroupDomain: a categorical domain (source × lang, folds, event
    *    types) — asserted at the test-scale cap.
    * An entry without a class cannot be allowlisted (the Map forces it).
    */
  sealed trait GridBound {
    /** Machine-readable growth law (VERDICT r12 #6): what the window
      * input's row count scales WITH, so the 100× argument lives in the
      * type. `scaleFree` = the cap cannot move when the corpus grows at
      * fixed time span / value range / domain. */
    def growthLaw: String
    def scaleFree: Boolean
  }
  /** Hard compile-time constant: bucket-offset grids, deciles,
    * contingency tables. Rows = k regardless of corpus size. */
  final case class FixedK(maxRows: Long) extends GridBound {
    def growthLaw = s"O(1): exactly $maxRows rows by construction"
    def scaleFree = true
  }
  /** Grows with the corpus TIME SPAN (days/weeks observed), never with
    * row count: 100× more rows in the same span adds zero rows. */
  case object CalendarGrid extends GridBound {
    def growthLaw = "O(span_days): day/week grid; row-count-independent"
    def scaleFree = true // at fixed span; span growth is the stated law
  }
  /** Saturates at value-range × fixed precision (2-decimal money grids,
    * integer-cent histograms, count-of-counts): a bounded value domain
    * admits a bounded distinct set no matter the corpus. */
  case object ValueGrid extends GridBound {
    def growthLaw =
      "O(range×precision), saturating: distinct bounded values, " +
        "row-count-independent once the domain is covered"
    def scaleFree = true // at fixed value domain; domain growth is the law
  }
  /** Categorical domain (source × lang, folds, event types): grows with
    * DOMAIN cardinality — the one class whose growth needs a per-entry
    * argument that the domain stays small at 100 TB. */
  case object GroupDomain extends GridBound {
    def growthLaw =
      "O(|domain|): categorical; grows only if the category set grows"
    def scaleFree = false // bounded by the domain argument, not by type
  }

  test("catalog sweep: unpartitioned windows only on allowlisted grid entries, always above an Aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.columnar.InMemoryRelation

    // streaming entries execute checkpointed micro-batch streams inside
    // run(); their returned frame is a bounded sink read-back and their
    // semantics are covered by the replay-equivalence oracle entries
    val streaming = queries.StreamQ.all.map(_.name).toSet

    // entries whose unpartitioned windows run on bounded post-agg grids
    // (each comment names the grid; the docstrings argue why it is
    // bounded). The list is EXACT: an allowlisted entry with no
    // unpartitioned window fails as stale, so the list cannot rot.
    val allowlist = Map[String, GridBound](
      "q95_ntile" -> CalendarGrid, // (month × priority) revenue grid (r11 fix: was per-customer)
      "q159_vocab_growth" -> FixedK(256), // 256-row bucket-offset grid (r11 fix: two-phase cumsum, was doc-scale)
      "q160_zipf_fit" -> FixedK(20), // top-20 token frame (TakeOrdered before the rank)
      "q167_cusum" -> CalendarGrid, // day grid
      "q193_key_skew" -> ValueGrid, // count-of-counts grid (distinct per-key counts)
      "q202_auc" -> ValueGrid, "q204_ks_test" -> ValueGrid, // 2-decimal score-grid ECDF cumulations
      "q205_chi2" -> FixedK(120), // 24×5 (hour × type) contingency grid
      "q207_gini_stump" -> ValueGrid, // 50-unit value-bin grid
      "q208_spearman" -> ValueGrid, // 2-decimal distinct-value grids
      "q210_source_shift" -> ValueGrid, // n_chars distinct-value grid
      "q213_theil_sen" -> CalendarGrid, // slope grid over the day-pair frame (span², ≤66k at a year)
      "q214_benford" -> FixedK(9), // 9-digit leading-digit grid
      "q215_gap_percentiles" -> ValueGrid, // distinct gap-seconds grid (time-span-bounded)
      "q225_kaplan_meier" -> CalendarGrid, // day grid after the dur_days agg
      "q234_quantile_norm" -> ValueGrid, // n_chars distinct-value grid
      "q245_compaction_plan" -> GroupDomain, // file-stats grid (source × lang)
      "q246_psi_drift" -> FixedK(20), // localCheckpoint'd 2×10 bin grid
      "q252_kfold_balance" -> GroupDomain, // fold × source grid
      "q253_conformal_coverage" -> ValueGrid, // n_chars score grid
      "q268_cumulative_reach" -> CalendarGrid, // day grid after the user min-day agg
      "q272_sprt" -> CalendarGrid, // day grid
      "q280_id_minting" -> FixedK(256), // 256-row bucket-offset grid
      "q289_hill_tail" -> ValueGrid, // n_chars distinct-value grid
      "q293_decile_lift" -> FixedK(10), // 10-row decile grid
      "q307_log_rank" -> CalendarGrid, // day grid
      "q309_kruskal_wallis" -> ValueGrid, // 2-decimal distinct-value grid
      "q310_cliffs_delta" -> ValueGrid, // 2-decimal distinct-value grids
      "q336_topk_churn" -> FixedK(20), // two 10-row top-k frames (limit(10) before the rank)
      "q339_seasonal_backtest" -> CalendarGrid, // day-index grid
      "q343_anomaly_consensus" -> CalendarGrid, // day grid
      "q345_ppl_filter_plan" -> FixedK(256), // 256-row bucket-offset grid (r12 fix: was the 6-decimal h grid)
      "q350_conditional_quantiles" -> ValueGrid, // integer n_ev count-of-counts grid (r10 fix: was user-scale)
      "q354_hash_uniformity" -> FixedK(65536), // ≤65536-cell md5-span grid (r10 fix: was user-scale)
      "q356_capture_knee" -> ValueGrid, // integer-cent spend histogram + 10-row curve (r11 fix: was user-scale)
      "q358_shard_quantile_merge" -> ValueGrid, // 2-decimal value grid
      "q379_source_gini" -> GroupDomain, // per-source grid (≤ source count)
      "q385_neyman_allocation" -> FixedK(5), // 5-row event-type strata grid
      "q397_cart_split" -> GroupDomain, // category grid (≤ distinct sources)
      "q423_partition_advisor" -> GroupDomain, // per-candidate partition-count grids (day/type/bucket)
      "q427_sketch_quantile_error" -> ValueGrid, // 2-decimal value grid + 256-bin sketch grid (r11)
      "q435_exp_mech_median" -> ValueGrid, // n_chars utility grid (r11)
      "q440_vocab_coverage" -> ValueGrid, // count-of-counts grid (r11)
      "q441_pinball_quantile" -> ValueGrid, // 2-decimal value-grid loss sweep (r11)
      "q449_source_ks_panel" -> ValueGrid, // shared n_chars grid ECDF (r11)
      "q450_hot_key_cache_plan" -> ValueGrid, // count-of-counts grid (r11)
      "q451_winsorized_ols" -> ValueGrid, // integer-cent spend histogram bounds (r11)
      "q452_aqe_coalesce_sim" -> FixedK(200), // 200-row partition grid (r11)
      "q453_dkw_band" -> ValueGrid, // 2-decimal value-grid ECDF (r11)
      // (q443's day-grid windows sit inside a PlanCache.persist'd
      // subplan — InMemoryRelation leaves are opaque to this sweep;
      // its grid discipline is argued in the entry docstring)
    )
    // test-scale row caps per class (sf0.001; generous — the point is to
    // catch corpus-cardinality grids masquerading as bounded ones, which
    // land orders of magnitude above these)
    def cap(b: GridBound): Long = b match {
      case FixedK(k) => k
      case CalendarGrid => 100000L // ≤ span-days² for the day-pair grid
      case ValueGrid => 1000000L // range × precision saturation
      case GroupDomain => 10000L
    }
    val unknown = allowlist.keySet -- SparkEntry.catalog.map(_.name).toSet
    assert(unknown.isEmpty, s"allowlist names not in the catalog: $unknown")

    // The sweep's AUDIT LISTING (VERDICT r12 #6): every allowlisted
    // entry with its bound class, test-scale cap, scale-free flag, and
    // growth law — the machine-readable form of the 100× argument. The
    // exhaustive `growthLaw`/`scaleFree` members on the sealed trait
    // guarantee no class can be added without stating its law.
    info("window allowlist: entry | class | cap | scale-free | growth law")
    allowlist.toSeq.sortBy(_._1).foreach { case (n, b) =>
      info(s"  $n | $b | cap=${cap(b)} | scaleFree=${b.scaleFree} | ${b.growthLaw}")
    }

    // does any path from `p` reach a source relation without crossing an
    // aggregation or a bounded-by-construction node?
    def rawLeafReachable(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => false
      case _: GlobalLimit => false
      case _: LocalRelation => false
      case _: OneRowRelation => false
      case _: Range => false // literal grids only in this repo
      // localCheckpoint = the repo's deliberate materialize-a-TINY-grid
      // device (q182/q246 et al.); a row-scale checkpoint would blow
      // driver/executor memory long before this test saw it
      case _: org.apache.spark.sql.execution.LogicalRDD => false
      case imr: InMemoryRelation =>
        // persisted frame: grid iff the cached plan itself aggregates.
        // String check: under AQE the cachedPlan is an
        // AdaptiveSparkPlanExec leaf whose children don't expose the
        // inner tree, but its treeString prints it.
        !"(Hash|Sort|ObjectHash)Aggregate".r
          .findFirstIn(imr.cachedPlan.toString).isDefined
      case other if other.children.isEmpty => true
      case other => other.children.exists(rawLeafReachable)
    }

    // Second mechanized rule riding the same pass (r12): NO entry may
    // plan a CartesianProduct. Every cross join in the repo is a
    // broadcast of tiny metadata (1-row aggregates, threshold grids) —
    // BroadcastNestedLoopJoin. A CartesianProduct means a non-broadcast
    // cross of two distributed sides: the canonical scale-killer, and a
    // silent one when a crossJoin's broadcast() hint is dropped in a
    // refactor. Checked on the physical plan (the logical plan cannot
    // distinguish the two).
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for (q <- SparkEntry.catalog if !streaming(q.name)) {
      val qe =
        try q.run(spark, sfDir).queryExecution
        catch { case e: Throwable =>
          fail(s"${q.name}: plan construction failed: ${e.getMessage}")
        }
      if (qe.executedPlan.toString.contains("CartesianProduct"))
        offenders += s"${q.name}: CartesianProduct in the physical plan"
      val plan = qe.optimizedPlan
      val unpart = plan.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      }
      if (unpart.nonEmpty) {
        allowlist.get(q.name) match {
          case None =>
            offenders += s"${q.name}: ${unpart.size} unpartitioned Window(s)"
          case Some(bound) =>
            if (unpart.exists(w => rawLeafReachable(w.child)))
              offenders += s"${q.name}: allowlisted, but an unpartitioned " +
                "Window sits on a raw-row input (no Aggregate below)"
            else {
              // execute each window INPUT and assert the class cap — the
              // machine check that the "grid" really is grid-sized.
              // Distinct window children only (duplicated plan branches
              // replay the same grid); canonicalized dedup.
              val mx = cap(bound)
              unpart.map(_.child)
                .groupBy(_.canonicalized).values.map(_.head)
                .foreach { child =>
                  val n = spark.sessionState.executePlan(child).toRdd.count()
                  if (n > mx)
                    offenders += s"${q.name}: $bound window input has " +
                      s"$n rows at test scale (cap $mx)"
                }
            }
        }
      } else if (allowlist.contains(q.name))
        offenders += s"${q.name}: stale allowlist entry (no " +
          "unpartitioned Window in the optimized plan)"
      operators.PlanCache.releaseAll()
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty,
      "window-discipline violations (add to the allowlist ONLY with a " +
        "docstring argument that the window input is a bounded grid):\n" +
        offenders.mkString("\n"))
  }
}
