package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards over the WHOLE driver battery: the
  * scale-critical properties the round-1 plan audit verified by hand
  * (no accidental cartesian, broadcast chosen for the dimension join,
  * distributed top-k, map-side partial aggregation, column pruning down
  * to the scan) — asserted on every build so a future refactor can't
  * silently regress a query into a 100 TB scale-killer.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("no battery query plans a non-broadcast cartesian product") {
    // broadcast(1-row stats)/crossJoin pairs plan BroadcastNestedLoopJoin,
    // which is fine; a plain CartesianProduct operator means a missing
    // join key or a dropped broadcast hint — O(N^2) shuffle at scale
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n${p.take(3000)}")
    }
  }

  test("battery-wide: every unpartitioned window sits above a bounded input") {
    // The round-2 contract was scaladoc-only ("windows bounded by strata
    // tables / AucEvalSize cuts / version rows"); this makes it a machine
    // check: an unpartitioned WindowExec funnels its WHOLE input through
    // one task, so it is only admissible when that input is provably
    // bounded — either a limit-family operator below it (TakeOrdered /
    // Global/LocalLimit — the AucEvalSize pattern) or an aggregation
    // grain whose cardinality is a documented data contract (the
    // allow-list below). A new corpus-sized unpartitioned window fails
    // this test. (Final output `orderBy`s DO plan global sorts — that is
    // the driver dump's determinism contract over already-reduced
    // results, not a window, and stays out of scope here.)
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

    // Grain-bounded unpartitioned windows: cardinality fixed by a
    // documented contract, not by row count. Key → bounding contract.
    // EXACT list — the test below also fails on STALE entries, so every
    // name here provably plans a grain-bounded unpartitioned window today
    val grainBounded: Map[String, String] = Map(
      "q_quota_alloc" -> "window over the (lang, source) strata grain",
      "q_hist_quantiles" -> "window over the fixed histogram-bin grid",
      "q_mann_whitney" -> "window over the distinct-value grain",
      "q_spearman" -> "windows over the two distinct-value grains",
      "q_gini" -> "window over the distinct-value grain",
      "q_gini_stump" -> "window over the candidate-threshold grain",
      "q_theil_sen" -> "window over the sampled pair-slope grain",
      "q_cusum" -> "window over the bounded day grid",
      "q_conformal" -> "threshold pick over the distinct-score value grain",
      "q_max_cover" -> "cumulative sum over the K checkpointed limit-1 rounds")

    def bounded(p: SparkPlan): Boolean = p.collectFirst {
      case _: GlobalLimitExec => ()
      case _: LocalLimitExec => ()
      case _: TakeOrderedAndProjectExec => ()
      case _: CollectLimitExec => ()
    }.isDefined

    val flagged = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      val sp = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
      sp.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) => w
        case w: WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !bounded(w.child) => w
      }.nonEmpty
    }.toSet
    val offenders = flagged -- grainBounded.keySet
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input (add a limit below the " +
        s"window, partition it, or document the bounding grain in the " +
        s"allow-list): ${offenders.toSeq.sorted.mkString(", ")}")
    // the allow-list must stay EXACT: an entry whose query no longer
    // plans a grain-bounded unpartitioned window is stale — and a stale
    // entry would silently excuse a FUTURE corpus-sized window there
    val stale = grainBounded.keySet -- flagged
    assert(stale.isEmpty,
      s"stale allow-list entries (queries no longer plan an unpartitioned " +
        s"window — remove them): ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("q_broadcast_join broadcasts the dimension side and pushes the join filter") {
    val p = plan("q_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull("), p.take(2000))
  }

  test("q_topk_docs is a distributed TakeOrderedAndProject over a pruned scan") {
    val p = plan("q_topk_docs")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    // the documents scan must not read the wide text column for a
    // (doc_id, n_chars) top-k
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("text"), s"text column not pruned:\n$scanLine")
  }

  test("q_lexical_score broadcasts the top-V vocab and selects it distributed") {
    val p = plan("q_lexical_score")
    // top-V cut = TakeOrderedAndProject (V rows to the driver, not a
    // global sort); vocab side rides a broadcast to the token join
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("q_dup_spans windows are doc-partitioned and the gram agg is partial") {
    val p = plan("q_dup_spans")
    // the interval merge must never plan an unpartitioned window — that
    // would funnel the whole corpus through one task
    assert(p.contains("windowspecdefinition(doc_id"), p.take(3000))
    assert(!p.contains("windowspecdefinition(st"),
      s"unpartitioned window in dup-span merge:\n${p.take(3000)}")
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("q1_agg aggregates with a map-side partial pass") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q_asof_join is one user-keyed shuffle, no theta join") {
    val p = plan("q_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("SortMergeJoin"),
      s"as-of must be window-composed, not joined:\n${p.take(2000)}")
    val userExchanges = p.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges == 1,
      s"expected exactly one user_id shuffle, got $userExchanges:\n${p.take(3000)}")
    assert(p.contains("last(view_id"), p.take(2000))
  }

  test("q_asof_exec plans the custom sorted-merge operator, co-partitioned") {
    val p = plan("q_asof_exec")
    assert(p.contains("AsofJoin"),
      s"custom as-of exec not planned:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of exec degenerated into a theta join:\n${p.take(2000)}")
    // the merge's whole cost: one key shuffle per side (EnsureRequirements
    // materializes the ClusteredDistribution requirement), nothing wider
    // key-only exchanges (the view dedup's (user_id, ts) agg shuffle is
    // separate and expected)
    val keyOnly = """hashpartitioning\((user_id|v_user)#\d+L?, \d+\)""".r
    val keyExchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && keyOnly.findFirstIn(l).isDefined)
    assert(keyExchanges == 2,
      s"expected one key shuffle per side, got $keyExchanges:\n${p.take(3000)}")
  }

  test("q_asof_broadcast never moves the left side: broadcast exchange only") {
    val p = plan("q_asof_broadcast")
    assert(p.contains("AsofJoinBroadcast"),
      s"broadcast as-of exec not planned:\n${p.take(2000)}")
    assert(p.contains("BroadcastExchange"), p.take(2000))
    // the purchases (left) side must have NO key shuffle — the only
    // exchanges allowed are the views dedup agg shuffle (keyed on
    // (v_user, v_ts)) and the broadcast itself
    val leftShuffle = """hashpartitioning\(user_id#\d+L?, \d+\)""".r
    assert(p.linesIterator.forall(l =>
        !(l.contains("Exchange") && leftShuffle.findFirstIn(l).isDefined)),
      s"left side of the broadcast as-of was shuffled:\n${p.take(3000)}")
  }

  test("q_quantile_sample ranks the sample in two sharded window levels") {
    val p = plan("q_quantile_sample")
    // the bottom-k sample must never rank a whole source in one task:
    // first a (source, h mod 256) shard window, then the ≤256·k survivors
    assert(p.contains("windowspecdefinition(source"), p.take(3000))
    assert(p.contains("pmod"), s"shard level missing:\n${p.take(3000)}")
    // limits pushed below both windows (WindowGroupLimit)
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("q_promo_revenue broadcasts the part dimension over a pruned fact scan") {
    val p = plan("q_promo_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
    val factScan = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(!factScan.contains("l_tax") && !factScan.contains("l_quantity"),
      s"lineitem scan not pruned:\n$factScan")
  }

  test("q_next_event windows per user and partial-aggregates the matrix") {
    val p = plan("q_next_event")
    assert(p.contains("windowspecdefinition(user_id"), p.take(3000))
    assert(p.contains("partial_count"), p.take(3000))
  }

  test("q_funnel_steps aggregates each step map-side; no per-user sort") {
    val p = plan("q_funnel_steps")
    assert(p.contains("partial_min"), p.take(3000))
    // funnel must never sort events per user or collect event lists
    assert(!p.contains("collect_list"), p.take(3000))
    assert(!p.contains("windowspecdefinition"), p.take(3000))
  }

  test("q_cohort_retention count-distincts with partial aggregation") {
    val p = plan("q_cohort_retention")
    assert(p.contains("partial_min") || p.contains("partial_count"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q_gap_fill windows per user and never plans an unpartitioned fill") {
    val p = plan("q_gap_fill")
    // the LOCF window must be keyed on user_id — an unpartitioned window
    // would funnel every user's grid through one task
    assert(p.contains("windowspecdefinition(user_id"), p.take(3000))
    assert(!p.linesIterator.exists(l =>
        l.contains("windowspecdefinition()") ||
        l.contains("windowspecdefinition(d#")),
      s"unpartitioned window in gap fill:\n${p.take(3000)}")
    // grid generation is generate+explode, not a join against a calendar
    assert(p.contains("Generate explode"), p.take(3000))
  }

  test("q_json_extract prunes the scan to (event_type, props) and partial-aggregates") {
    val p = plan("q_json_extract")
    // typed native parse — no UDF in the plan
    assert(p.contains("from_json"), p.take(2000))
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"JSON parse fell out of native expressions:\n${p.take(2000)}")
    // scan must not read ts/user_id/value for a (event_type, props) agg
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("props") && !scanLine.contains("user_id"),
      s"events scan not pruned:\n$scanLine")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(3000))
  }

  test("q_sequence_pack prefix-sums in two sharded levels with a broadcast base join") {
    val p = plan("q_sequence_pack")
    // the wide running sum must be windowed per (source, shard) — a
    // source-only window would sort a whole 100 TB source in one task
    assert(p.contains("windowspecdefinition(source") &&
      p.linesIterator.exists(l => l.contains("Window [sum(n_toks") &&
        l.contains("shard")),
      s"per-(source,shard) window missing:\n${p.take(3000)}")
    // shard base offsets (one row per shard) ride a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), s"bases not broadcast:\n${p.take(3000)}")
  }

  test("q_kmv_sketch ranks k-min in two sharded window levels with pushed limits") {
    val p = plan("q_kmv_sketch")
    // two rank levels: (source, shard) then source alone — no task ever
    // sorts a whole source's distinct hash set
    val windows = p.linesIterator.count(_.contains("Window [row_number()"))
    assert(windows == 2, s"expected 2 rank windows, got $windows:\n${p.take(3000)}")
    // Spark pushes the rank<=K cut below the shuffle as a partial
    // WindowGroupLimit — each map task forwards at most K rows per group
    assert(p.contains("row_number(), 64, Partial"),
      s"partial window-group limit missing:\n${p.take(3000)}")
  }

  test("q_hll_sketch builds registers by partial agg alone — no rank, no distinct pass") {
    val p = plan("q_hll_sketch")
    // HLL's whole point at 100 TB: duplicate tokens collapse inside the
    // map-side register max — the sketch side must plan ZERO windows
    // (KMV's rank levels) and the register agg must combine partially
    assert(!p.contains("Window [row_number()"),
      s"register path plans a rank window:\n${p.take(3000)}")
    assert(p.contains("partial_max"),
      s"register max not map-side partial:\n${p.take(3000)}")
  }

  test("q_hll_agg ships fixed-size register buffers through a partial ObjectHashAggregate") {
    val p = plan("q_hll_agg")
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
    // the partial stage IS the scale claim: the shuffle carries one
    // 256-byte register buffer per (source × map partition), never rows
    assert(p.contains("partial_graft_hll"), p.take(3000))
  }

  test("q_training_select fuses the gates into one pass with a single dedup window") {
    val p = plan("q_training_select")
    val windows = p.linesIterator.count(_.contains("Window [row_number()"))
    assert(windows == 1, s"expected 1 dedup window, got $windows:\n${p.take(3000)}")
    // all gates live in the single aggregation pipeline: exactly one
    // hash aggregate pair (partial+final) over the post-filter rows
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q_decontaminate broadcasts the benchmark n-gram set") {
    // the eval-set side is tiny at any corpus scale — if the hint is
    // ever lost this becomes a full corpus-vs-corpus sort-merge join
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q_repetition aggregates bigram counts with a map-side partial pass") {
    val p = plan("q_repetition")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"bigram mode must partial-aggregate before the shuffle:\n${p.take(3000)}")
  }

  test("q_bloom_prune broadcasts the filter word table to the probe side") {
    // the whole point of the Bloom pattern is that the history never
    // re-shuffles per batch: the bit-array words must BROADCAST
    val p = plan("q_bloom_prune")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q_ann_cosine_topk broadcasts the query vector and pushes the id filters") {
    // (graft_cosine's own codegen residency is asserted in
    // GraftFunctionsSpec on a clean scan+project; here the stage also
    // carries the float→double `transform`, a codegen-fallback HOF)
    val p = plan("q_ann_cosine_topk")
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), Not(EqualTo(vec_id,0))]"),
      s"vec_id filters not pushed to the scan:\n${p.take(3000)}")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q_ann_pq encodes via broadcast codebook and a PARTIAL argmin aggregate") {
    // the codeword assignment must be min(struct) with a map-side
    // partial (the shuffle carries one row per (vector, subspace), not
    // ks) — and the codebook rides broadcasts, never a shuffle join
    val p = plan("q_ann_pq")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"argmin must have a partial (map-side) phase:\n${p.take(3000)}")
  }

  test("q_ann_ivfpq keeps centroid/codebook joins on broadcasts; one keyed join") {
    val p = plan("q_ann_ivfpq")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the ONLY shuffle join allowed is the vec_id-keyed cell attach
    // (two corpus-sized sides — a keyed equi-join IS the scale-correct
    // plan for the oracle formulation; the real IvfPqIndex stores the
    // cell with the codes, so it has no join at all); everything
    // touching the O(√N) centroids / O(m·ks) codebook must broadcast
    assert(p.sliding("SortMergeJoin".length).count(_ == "SortMergeJoin") <= 1,
      s"more than one shuffle join in the IVFADC oracle:\n${p.take(3000)}")
  }

  test("q_dsir_weights joins the O(B) weight table as a broadcast") {
    val p = plan("q_dsir_weights")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // bucket stats must partial-aggregate map-side before the shuffle
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"bucket counts must have a partial phase:\n${p.take(3000)}")
  }

  test("q_gopher_rules is a pure per-row scan — no joins, no aggregates") {
    // every rule is a column expression; a join or aggregate appearing
    // here means someone broke the one-narrow-pass contract
    val p = plan("q_gopher_rules")
    assert(!p.contains("Join"), s"q_gopher_rules must not join:\n${p.take(3000)}")
    assert(!p.contains("HashAggregate"),
      s"q_gopher_rules must not aggregate:\n${p.take(3000)}")
  }

  test("q_paragraph_dedup aggregates segment df with a map-side partial pass") {
    val p = plan("q_paragraph_dedup")
    assert(p.contains("partial_count"),
      s"segment df must partial-aggregate before the shuffle:\n${p.take(3000)}")
  }

  test("q_collocations cuts with a distributed TakeOrdered, partial-agged counts") {
    val p = plan("q_collocations")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(p.contains("partial_count"),
      s"unigram/bigram counts must have a partial phase:\n${p.take(3000)}")
  }

  test("q_fuzzy_match partial-aggregates block sizes and equi-joins on the block key") {
    val p = plan("q_fuzzy_match")
    assert(p.contains("partial_count"),
      s"block-size counts must have a partial phase:\n${p.take(3000)}")
    // the Levenshtein pair stage must ride the blk equi-join, never a
    // cartesian (the global guard) — and the 1-row N rides a broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q_bpe_merges partial-aggregates pair counts, argmaxes distributed, applies via broadcast") {
    val p = plan("q_bpe_merges")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"pair counts must have a map-side partial phase:\n${p.take(3000)}")
    // per-round argmax = distributed TakeOrdered(1), never a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    // the 1-row best pair rides a broadcast into the apply pass
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q_linear_probe trains via bounded integer aggregates and broadcast scale") {
    val p = plan("q_linear_probe")
    // a (D-vector) and G (DxD Gram) aggregates must partial-agg map-side
    assert(p.contains("partial_count"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
    // the 1-row corpus size rides a broadcast into the weight build
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // top-20 scoring cut is a distributed TakeOrdered, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q_cms_topk builds the sketch with a partial agg and broadcasts it to the probe") {
    val p = plan("q_cms_topk")
    assert(p.contains("partial_count"),
      s"sketch counters must partial-agg map-side:\n${p.take(3000)}")
    // the KB-scale sketch rides broadcast hash joins into the top-k probe
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q_probe_auc samples via distributed TakeOrdered before the bounded rank window") {
    val p = plan("q_probe_auc")
    // the md5 eval sample is a TakeOrdered cut, so the global AUC rank
    // window sees a BOUNDED input at any corpus size
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(3000))
  }

  test("q_semdedup broadcasts centroids and confines the pair join to cells") {
    val p = plan("q_semdedup")
    // centroid assignment = broadcast nested loop against O(√N) cents;
    // the pairwise stage must be a CELL-keyed equi-join (SMJ/SHJ on
    // cell), never a cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"pair stage must be a cell equi-join:\n${p.take(3000)}")
  }

  test("q_range_frame runs a user-partitioned RANGE frame over a pruned scan") {
    val p = plan("q_range_frame")
    assert(p.contains("windowspecdefinition(user_id"), p.take(3000))
    assert(p.contains("specifiedwindowframe(RangeFrame, -3600"), p.take(3000))
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("props"), s"props column not pruned:\n$scanLine")
  }

  test("q_cube plans one Expand into a single partial+final agg — not four scans") {
    val p = plan("q_cube")
    assert(p.contains("Expand"), p.take(3000))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(3000))
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"cube must read the table once:\n${p.take(3000)}")
  }

  test("q_null_safe_join keys the join on null-safe equality — no nested loop") {
    val p = plan("q_null_safe_join")
    // EqualNullSafe is a first-class hash/sort-merge join key in Catalyst
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"null-safe join fell back to a nested loop:\n${p.take(3000)}")
  }

  test("q_moving_avg frames a user-partitioned ROWS window over a pruned scan") {
    val p = plan("q_moving_avg")
    assert(p.contains("windowspecdefinition(user_id"), p.take(3000))
    assert(p.contains("specifiedwindowframe(RowFrame, -2, currentrow$())"),
      p.take(3000))
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("props"), s"props column not pruned:\n$scanLine")
  }

  test("q_triangles closes wedges with keyed joins — semi-join closure, no cartesian") {
    val p = plan("q_triangles")
    // the wedge stage must be an equi-join on the oriented source vertex
    // (the e1.w < e2.w bound rides as a post-join filter), and the
    // triangle closure a LeftSemi against the canonical edge list
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q_pagerank iterates with keyed joins + partial contribution sums — no window, no cartesian") {
    val p = plan("q_pagerank")
    // each round's contribution sum must combine map-side (a hot vertex's
    // in-contributions collapse before the shuffle) and the state joins
    // must be keyed equi-joins; a window or global sort would funnel the
    // rank vector through one task
    assert(p.contains("partial_sum") || p.contains("partial(sum"), p.take(3000))
    assert(!p.contains("windowspecdefinition"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
    // final top-20 is distributed, not a global sort
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q_kmv_algebra merges sketches under partitioned windows with a broadcast source cut") {
    val p = plan("q_kmv_algebra")
    // per-source and per-pair k-min selections are PARTITIONED windows
    assert(p.contains("windowspecdefinition(source"), p.take(3000))
    assert(p.contains("windowspecdefinition(sa"), p.take(3000))
    // the 3-source restriction rides a broadcast join to the shingle pass
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q_hll_union merges registers with keyed partial maxes — no distinct pass on raw data") {
    val p = plan("q_hll_union")
    // per-source registers and the per-pair union are partial-agg maxes;
    // the only distinct is the exact-truth certification column
    assert(p.contains("partial_max"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000)) // 3-source cut
  }

  test("q_anomaly_zscore broadcasts the per-type moments — the fact side never shuffles") {
    val p = plan("q_anomaly_zscore")
    // |event types| stat rows ride a broadcast back onto the narrow scan;
    // the events side must see no Exchange at all (one linear pass)
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(3000))
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("props"), s"props column not pruned:\n$scanLine")
  }

  test("q_tfidf_keywords windows per document with a pushed group limit") {
    val p = plan("q_tfidf_keywords")
    // the rank<=3 cut must push map-side (WindowGroupLimit) and the
    // window must be doc-partitioned, never corpus-wide
    assert(p.contains("windowspecdefinition(doc_id"), p.take(3000))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000)) // 1-row N
  }

  test("q_correlation is one partial+final moment aggregation") {
    val p = plan("q_correlation")
    assert(p.contains("partial_sum"), p.take(3000))
    assert(!p.contains("Window"), s"no window belongs here:\n${p.take(3000)}")
  }

  test("q_bpe_encode applies merges via broadcast and joins the vocab on its key") {
    val p = plan("q_bpe_encode")
    // each merge round = broadcast 1-row pair (BNLJ); the corpus join-back
    // is an equi-join on the word key
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000)) // argmax pair
  }
}
