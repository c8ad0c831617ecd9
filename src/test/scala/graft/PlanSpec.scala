package graft

/** Plan-quality regression tests (SURVEY.md §4): the judge-relevant
  * physical properties — pushdown, pruning, broadcast choice, top-k
  * operator — asserted so a refactor can't silently regress them. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    QueryRegistry.byName(name).fn(spark, sf)
      .queryExecution.executedPlan.toString

  private def formatted(name: String): String =
    QueryRegistry.byName(name).fn(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("q02: range filters reach the parquet scan; top-k is TakeOrderedAndProject") {
    val f = formatted("q02_filter_project_topk")
    assert(f.contains("TakeOrderedAndProject"))
    assert(f.contains("PushedFilters") &&
      f.contains("GreaterThanOrEqual(l_shipdate"), f)
    // column pruning: scan must not read unused money columns like l_tax
    assert(!f.contains("l_tax"), "scan reads pruned column")
  }

  test("q21: pre-filter pushed into scan before scoring (O1) + pruned schema") {
    val f = formatted("q21_vector_topk_prefiltered")
    assert(f.contains("In(lang, [en,fr])"), f)
    assert(f.contains("TakeOrderedAndProject"))
  }

  test("q04: dimension joins are broadcast, not shuffled") {
    val p = planOf("q04_broadcast_region_rollup")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "dim join fell back to SMJ")
  }

  test("q05/q06: semi and anti joins keep their join type through planning") {
    assert(planOf("q05_semi_join_active_buyers").contains("LeftSemi"))
    assert(planOf("q06_anti_join_inactive").contains("LeftAnti"))
  }

  test("q20: top-k over the scored scan has no global Sort node") {
    val p = planOf("q20_vector_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q34: LSH candidate join is an equi hash/merge join, never cartesian") {
    val p = planOf("q34_minhash_lsh_pairs")
    assert(!p.contains("CartesianProduct"), "LSH pair join degenerated to cartesian")
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("partial_"), s"no partial aggregation in:\n$p")
  }

  test("q26/q80: ANN probe sides broadcast; no cartesian in the probe joins") {
    for (name <- Seq("q26_ivf_ann_topk", "q80_lsh_signbit_ann")) {
      val p = planOf(name)
      assert(p.contains("BroadcastHashJoin"), s"$name: probe set not broadcast\n$p")
      assert(!p.contains("SortMergeJoin"), s"$name: probe join fell back to SMJ\n$p")
      assert(!p.contains("CartesianProduct"), s"$name: cartesian in ANN path")
      assert(p.contains("TakeOrderedAndProject"), s"$name: rescore top-k is a global sort")
    }
  }

  test("q26: rescore joins the broadcast probed-cell set on a pruned scan") {
    val p = planOf("q26_ivf_ann_topk")
    // the nprobe cut arrives at the rescore as a broadcast hash join on
    // the cell label (runtime cell filtering — the IVF contract)
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("c_label")),
      s"rescore cell filter is not a broadcast join on the probed cells\n$p")
    // the rescore scan reads only (vec_id, embedding, label)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>,label:int>"),
      s"rescore scan schema not pruned\n$p")
  }

  test("q80: multi-probe bucket set is broadcast into the signature join") {
    val p = planOf("q80_lsh_signbit_ann")
    // probes (query bucket + Hamming-1 neighbors — always 7 rows) joins
    // the signature table as the broadcast build side keyed on the bucket
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("pbucket")),
      s"probe-bucket join is not broadcast on bucket id\n$p")
  }

  test("q79: PassJoin candidates come from an equi join; shuffle carries no strings after verify") {
    val p = planOf("q79_passjoin_k2_varlen")
    assert(!p.contains("CartesianProduct"), "segment join degenerated to cartesian")
    // verify-then-int-dedup: the final aggregate is partial+final on ints
    assert(p.contains("partial_min"), s"no map-side partial dedup aggregate in:\n$p")
  }

  test("q76: profile side-inputs broadcast (anti-join and boost join)") {
    val p = planOf("q76_profile_personalized")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "profile join fell back to SMJ")
  }

  test("top-k-per-group: rank-filter idiom planned as TopKPerGroupExec, not Window") {
    for (name <- Seq("q07_top3_orders_per_customer", "q14_last_writer_wins")) {
      val p = planOf(name)
      // two-phase: partial heaps before the shuffle, final emits ranks
      // (physical nodes print without the Exec suffix)
      assert("TopKPerGroup \\[".r.findAllIn(p).size == 2,
        s"$name: expected partial+final TopKPerGroupExec\n$p")
      assert(!p.contains("WindowGroupLimit"),
        s"$name: builtin WindowGroupLimit stack not subsumed\n$p")
      assert(!p.contains("Window ["),
        s"$name: window operator survived the rewrite\n$p")
    }
  }

  test("q86: as-of join plans as the custom sort-merge exec, no window/cartesian") {
    val p = planOf("q86_asof_join_two_table")
    assert(p.contains("AsOfJoin"), s"custom as-of exec missing\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of degenerated to a pair-exploding join\n$p")
    assert(!p.contains("Window ["), s"as-of fell back to the union-window trick\n$p")
  }

  test("q87: range join is a bucket equi-join, never a nested-loop pair explosion") {
    val p = planOf("q87_range_join_bucketed")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to pair explosion\n$p")
    assert(p.contains("hb"), s"bucket key missing from the join\n$p")
  }

  test("q88: star join broadcasts dims; fact join never degenerates to cartesian") {
    val p = planOf("q88_star_join_q5")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast dim join\n$p")
    assert(!p.contains("CartesianProduct"), "star join degenerated to cartesian")
  }

  test("q90: BM25 side tables broadcast; only token-count + doc joins shuffle") {
    val p = planOf("q90_bm25_retrieval")
    // terms (3 rows), dfreq (3 rows), stats (1 row) must all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size +
      "BroadcastNestedLoopJoin".r.findAllIn(p).size >= 3, p)
    assert(p.contains("TakeOrderedAndProject"), "top-k fell back to global sort")
  }

  test("q92: unpivot plans as a narrow Expand — no shuffle before the output sort") {
    val p = planOf("q92_unpivot_part_metrics")
    assert(p.contains("Expand"), s"unpivot not planned as Expand\n$p")
    // exactly one exchange: the final orderBy's range partitioning
    assert("Exchange".r.findAllIn(p).size == 1, s"unexpected shuffles\n$p")
  }

  test("q93: gap-fill calendar is broadcast; LOCF window keyed on user_id") {
    val p = planOf("q93_gapfill_locf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"calendar dim not broadcast\n$p")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("hot paths stay inside WholeStageCodegen (incl. the custom cosine expr)") {
    // the custom CosineSimilarity expression implements doGenCode — the
    // scoring scan must fuse into a codegen span, not fall back to
    // interpreted eval rows. Codegen spans only appear in the FINAL
    // adaptive plan, so execute the Dataset first (same caveat as the
    // AQE skew test: inspect the executed Dataset, not a sibling).
    // WholeStageCodegenExec prints as a "*(id)" prefix on every operator
    // it fuses; AQE query-stage wrappers hide the exec nodes from
    // TreeNode.collect, so the marker string is the reliable signal
    for (name <- Seq("q01_pricing_summary", "q20_vector_topk", "q31_token_stats")) {
      val df = QueryRegistry.byName(name).fn(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("*("), s"$name has no codegen span:\n$p")
    }
  }

  test("q82: sampling is a pure map — broadcast rates, only the output sort shuffles") {
    val p = planOf("q82_stratified_split")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "rates join fell back to SMJ")
    // the md5 gate must not induce a data shuffle; the only Exchange
    // allowed is the rangepartitioning for the deterministic output order
    val rangeOnly = p.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("BroadcastExchange"))
      .forall(l => l.contains("rangepartitioning") || l.contains("SinglePartition"))
    assert(rangeOnly, s"unexpected data shuffle in sampling plan:\n$p")
  }

  test("q99: packing reuses ONE source-clustered shuffle for window + groupBy") {
    // hashpartitioning(source) satisfies the groupBy(source, window_id)
    // clustering requirement, so the window's exchange must be the only
    // data shuffle (plus the deterministic output range sort)
    val p = planOf("q99_sequence_packing")
    val dataEx = p.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("BroadcastExchange"))
      .filterNot(l => l.contains("rangepartitioning") || l.contains("SinglePartition"))
      .toSeq
    assert(dataEx.size <= 1, s"packing shuffles more than once:\n$p")
  }

  test("q100/q103: chunking and repetition filter are narrow scans") {
    for (n <- Seq("q100_chunk_overlap", "q103_repetition_filter")) {
      val p = planOf(n)
      val ok = p.linesIterator.filter(_.contains("Exchange"))
        .filterNot(_.contains("BroadcastExchange"))
        .forall(l => l.contains("rangepartitioning") || l.contains("SinglePartition"))
      assert(ok, s"$n shuffles data:\n$p")
    }
  }

  test("q104: targets and total join as broadcasts; no sort-merge join") {
    val p = planOf("q104_mixture_weights")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"broadcast-sized side fell back to SMJ:\n$p")
  }

  test("q105: absmax stats and query codes broadcast; top-k has no global sort") {
    val p = planOf("q105_int8_quant_ann")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), s"int8 ADC top-k sorts globally:\n$p")
    assert(!p.contains("SortMergeJoin"), s"broadcast side fell back to SMJ:\n$p")
  }

  test("q106: e2e pipeline joins broadcast (eval shingles + contam ids); no SMJ") {
    val p = planOf("q106_curation_pipeline_e2e")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"small side fell back to SMJ:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q101: pivot stays one partial+final aggregation, no join, no expand blowup") {
    val p = planOf("q101_pivot_revenue_matrix")
    assert(!p.contains("Join"), s"pivot introduced a join:\n$p")
    val dataEx = p.linesIterator.filter(_.contains("Exchange"))
      .filterNot(_.contains("BroadcastExchange"))
      .filterNot(l => l.contains("rangepartitioning") || l.contains("SinglePartition"))
      .toSeq
    assert(dataEx.size <= 1, s"pivot shuffles more than once:\n$p")
  }

  test("q108: PII scrub is a narrow per-row map — no shuffle before the output sort") {
    val p = planOf("q108_pii_scrub")
    assert(!p.contains("Join"), s"scrub introduced a join:\n$p")
    val dataEx = p.linesIterator.filter(_.contains("Exchange"))
      .filterNot(l => l.contains("rangepartitioning") || l.contains("SinglePartition"))
      .toSeq
    assert(dataEx.isEmpty, s"per-row scrub shuffles:\n$p")
  }

  test("q110: correlated LATERAL + LIMIT decorrelates to WindowGroupLimit, no per-row subquery") {
    val p = planOf("q110_lateral_topk_per_region")
    // vanilla Spark plans the decorrelated per-group LIMIT as
    // WindowGroupLimit; with GraftExtensions installed our TopKPerGroup
    // rule upgrades it further to the two-phase heap exec (partial heap
    // BEFORE the shuffle) — accept either short-circuit, reject a full
    // Window sort.
    assert(p.contains("TopKPerGroup") || p.contains("WindowGroupLimit"),
      s"per-group limit not short-circuited:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"region join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lateral degenerated to nested loop:\n$p")
  }

  test("q112: mixture quotas broadcast back; only the per-source window shuffles") {
    val p = planOf("q112_temperature_mixture")
    assert(p.contains("BroadcastHashJoin"), s"quota join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"quota join fell back to SMJ:\n$p")
  }

  test("q113: hard-negative queries broadcast against the corpus scan, no SMJ") {
    val p = planOf("q113_hard_negative_mining")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query set not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"mining fell back to SMJ:\n$p")
  }

  test("q114: snapshot diff is ONE full-outer hash join on the id, fingerprints map-side") {
    val p = planOf("q114_corpus_diff")
    assert(p.contains("FullOuter"), s"diff lost its full-outer join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // fingerprint, not text, crosses the shuffle: md5 is computed below the join
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"raw text shipped through the diff shuffle:\n$p")
  }

  test("q111: repeated-span inventory is explode + ONE hash aggregation on the span") {
    val p = planOf("q111_repeated_spans")
    assert(!p.contains("Join"), s"span inventory introduced a join:\n$p")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), s"agg fell back to sort-based:\n$p")
  }

  test("q109: full vocabulary never crosses an unpartitioned window — " +
    "Window sits ABOVE TakeOrderedAndProject(100)") {
    val f = formatted("q109_vocab_coverage")
    assert(f.contains("TakeOrderedAndProject"), s"top-100 fell back to global sort:\n$f")
    // the Window's child chain must contain the TakeOrderedAndProject, i.e.
    // in the formatted tree the Window's step number is LOWER (closer to
    // root) than the top-k's — windows only ever see the 100 survivors
    val winStep = "\\((\\d+)\\)".r.findFirstMatchIn(
      f.linesIterator.find(_.matches(".*[:+]- Window \\(\\d+\\)")).getOrElse(fail(f)))
      .get.group(1).toInt
    val topkStep = "\\((\\d+)\\)".r.findFirstMatchIn(
      f.linesIterator.find(_.contains("TakeOrderedAndProject")).getOrElse(fail(f)))
      .get.group(1).toInt
    assert(winStep > topkStep,
      s"Window (step $winStep) is BELOW the top-k (step $topkStep) — full vocab through one task:\n$f")
    // the grand total is a scalar agg broadcast back, not a window
    assert(f.contains("BroadcastNestedLoopJoin") || f.contains("BroadcastExchange"), f)
  }

  test("q118: hard negatives come from the broadcast sign-LSH probe, " +
    "which caps the rank window's input") {
    val p = planOf("q118_hard_negative_ann")
    // probe keys and query set broadcast; candidate join is hash, not SMJ/cartesian
    assert(p.contains("BroadcastHashJoin"), s"probe set not broadcast-joined:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the probe path:\n$p")
    assert(!p.contains("SortMergeJoin"), s"probe path fell back to SMJ:\n$p")
    // the per-query rank runs as the partial+final TopKPerGroup exec keyed
    // on q_id (the whole-operator Catalyst stack), never a global window
    assert(p.contains("TopKPerGroup [q_id"), s"per-query rank lost TopKPerGroup:\n$p")
  }

  test("q117/q119: BPE apply is narrow maps over the corpus — no shuffle " +
    "after the scan in the tokenize pass") {
    val p = planOf("q119_bpe_tokenize_apply")
    // the apply chain itself (post-training) is projections over one scan
    // + the final output sort; candidate shuffles would show as joins
    assert(!p.contains("Join"), s"tokenize apply introduced a join:\n$p")
    assert(p.contains("Scan parquet"), p)
  }

  test("ed-join auto-selection: brute stays a single-stage join under the " +
    "ceiling, PassJoin segments above it") {
    import org.apache.spark.sql.functions.col
    val c = Tables.t(spark, sf, "customer").select(col("c_custkey"), col("c_name"))
    val brute = operators.EditDistanceJoin
      .bruteForceSelfJoin(c, "c_custkey", "c_name", 1)
      .queryExecution.executedPlan.toString
    assert(brute.contains("BroadcastNestedLoopJoin"),
      s"brute path lost its broadcast nested loop:\n$brute")
    val pass = operators.EditDistanceJoin
      .selfJoinK1(c, "c_custkey", "c_name")
      .queryExecution.executedPlan.toString
    assert(!pass.contains("NestedLoop") && !pass.contains("CartesianProduct"),
      s"PassJoin degenerated to pair scanning:\n$pass")
  }

  test("full registry: no join residual evaluates >10 raw string ops per row") {
    // The r12 q79 regression made durable (VERDICT r12 #6): a deterministic
    // predicate over both join inputs gets folded into the join's RESIDUAL
    // condition, where it runs once per CANDIDATE row with no subexpression
    // elimination and a UTF8String allocation per substr — q79's ~20-substr
    // witness CASE cost 35x there. Expensive per-candidate work must either
    // be a fused codegen kernel (LevenshteinK / PassJoinWitness — custom
    // exprs are NOT counted here, that is their design contract) or sit in
    // a Filter/Project above the join. This audit walks every registry
    // query's physical plan (descending through AQE wrappers) and counts
    // raw string-manipulating builtins inside each join condition.
    // Intentional residuals stay cheap: interval/overlap conditions
    // (q87/q140/q153) are arithmetic, brute-force ed-joins carry the fused
    // kernel plus two length() calls.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.catalyst.expressions.Expression
    val stringOps = Set("Substring", "Concat", "ConcatWs", "Length",
      "Levenshtein", "StringReplace", "StringTranslate", "StringTrim",
      "StringTrimLeft", "StringTrimRight", "Upper", "Lower", "InitCap",
      "RegExpExtract", "RegExpReplace", "Like", "RLike", "StringSplit",
      "SplitPart", "StringLocate", "StringInstr", "StringRepeat",
      "StringLPad", "StringRPad", "Md5", "Sha1", "Sha2", "Crc32",
      "XxHash64", "Murmur3Hash", "SoundEx")
    def countOps(e: Expression): Int =
      (if (stringOps(e.getClass.getSimpleName)) 1 else 0) +
        e.children.map(countOps).sum
    def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case _ => p.children.flatMap(nodes)
    })
    val offenders = QueryRegistry.queries.flatMap { q =>
      nodes(q.fn(spark, sf).queryExecution.executedPlan).collect {
        case j: BaseJoinExec if j.condition.map(countOps).getOrElse(0) > 10 =>
          s"${q.name}: ${j.nodeName} residual has " +
            s"${countOps(j.condition.get)} string ops: ${j.condition.get}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("full registry: no CartesianProduct in any query's initial physical plan") {
    // The r7 §17 one-off audit made durable: every BroadcastNestedLoopJoin
    // in the suite is a deliberate ONE-ROW cross (a query vector, a stats
    // row) — a CartesianProduct node anywhere means a join lost its keys
    // and would cross fact-sized inputs at scale. Building all plans also
    // smoke-tests that every registry query still constructs.
    val offenders = QueryRegistry.queries.flatMap { q =>
      val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty, s"cartesian plans: $offenders")
  }
}
