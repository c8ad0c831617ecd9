package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r9 #3): PREDICTED-value checks at a ScaleGen-composed
  * scale factor for the suite's heaviest queries — the affirmative value
  * layer between "the run completed" (SuiteProbe) and "an oracle agreed"
  * (impossible at sf10: DuckDB DNFs).
  *
  * The lever is ScaleGen's construction (ScaleGen.scala:7-42): the big dir
  * is `reps` pairwise-disjoint BIJECTIVE images of the small dir — keys
  * shift by rep × (max_key + 1), text goes through a per-replica character
  * bijection (edit distance / token structure / shingle multisets exactly
  * preserved, nothing shared across replicas), embeddings through a
  * per-replica orthogonal transform, dims stay fixed. So for a query whose
  * answer decomposes per replica, the big answer is PREDICTED exactly from
  * the small answer: per-replica row counts equal the small count,
  * bijection-invariant value columns (edit distances, similarity ratios,
  * merge counts) have identical per-replica sums, and key columns are the
  * small keys plus rep × stride. Queries whose globals change with scale
  * (BM25's N, Apriori's n_orders, PageRank's node count) get per-query
  * predictions that recompute exactly what the global does to the small
  * answer; pipelines whose eval-slice membership is id-hash-reselected per
  * replica (q106/q120 — (base + rep·stride) % 97 is NOT the image of
  * base % 97) get WITNESS checks instead: every emitted row is re-derived
  * through an independent keyed dataflow and every claimed property
  * re-verified, which pins soundness (no wrong row) but not completeness
  * (a silently dropped row — that remains covered by the small-sf oracle).
  *
  * Checks and their prediction contracts:
  *  - q79/q77/q46 (replica-decomposable): per-replica count / sums
  *    of invariant columns == small answer's, key sums affine in rep,
  *    ZERO cross-replica rows. Doubles are per-row quantized to micro
  *    units before summing (bijective images produce bit-identical
  *    doubles; quantized sums are order-independent longs).
  *  - q121: per-replica mass conservation (survivors + absorbed == the
  *    per-replica corpus) with bounded band-recall jitter — see
  *    q121Check's scaladoc for why row-level decomposition does NOT hold.
  *  - q145: full top-50 reconstruction — images of the small rules with
  *    lift re-derived under n_orders' = reps × n_orders (integer-division
  *    order is PRESERVED under the multiplier: floor(10x) >= 10·floor(x),
  *    so the small ranking refines, never reorders), exact row-list
  *    equality, with a loud bail if the selection boundary ties.
  *  - q154: cohort symmetry of the top-100 — every pr_units cohort holds
  *    complete 10-replica families of base nodes (isomorphic subgraphs
  *    must rank identically), plus the (pr_units desc, node) sort contract.
  *  - q133: exact_union/exact_inter == reps × small (within 1e-4 relative:
  *    48-bit md5 shingle hashes can birthday-collide across replicas);
  *    error-contract booleans re-asserted at scale.
  *  - q90: independent recomputation — df/n/avgdl measured by a plain
  *    scan, per-(doc, term) tf collected (the matching slice is tiny),
  *    BM25 arithmetic replayed driver-side, exact top-20 equality; plus
  *    the cross-scale predictions n == reps × n_small, df == df_small
  *    (query terms live only in replica 0 — the ciphers share no words).
  *  - q120: witness re-score — every emitted (vec_id, eval_id, score)
  *    re-scored through a KEYED join (not the query's broadcast cross
  *    product) with the same fixed-point integer kernel, score and
  *    threshold and split-membership re-asserted per row.
  *  - q106: witness re-derivation — every surviving doc re-passes the
  *    quality/repetition filters via token_metrics, the md5 split bucket,
  *    fingerprint uniqueness, eval-shingle disjointness, and the packing
  *    window_id is recomputed from the output itself.
  *
  * Usage:
  *   SPARK_DRIVER_MEM=60g sbt "runMain graft.PredProbe /tmp/graft-sf1 \
  *     /tmp/graft-sf10 PRED_sf10.json [query names...]"
  */
object PredProbe {
  private def f3(d: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, d)

  def main(args: Array[String]): Unit = {
    val smallDir = args(0)
    val bigDir = args(1)
    val outJson = args.lift(2)
    val only = args.drop(3).toSet
    val reps = sys.env.getOrElse("GRAFT_PRED_REPS", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffleParts =
      sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", (cpus.toInt * 8).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", ShmDir.claim("graft-pred"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftExtensions.install(spark)
    import Tables.t

    def dropCached(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc()
    }
    // Build-time confs only: the aggregates/collects the checks hang off
    // the returned frame execute under session confs, NOT the per-query
    // gate (AQE re-reads conf at physical planning). That is deliberate
    // and safe here — the gate changes physical execution only, never
    // values (the ExecConfsSpec parity contract), and PredProbe checks
    // VALUES; its secs are not comparable to Bench/SuiteProbe cells.
    def runQ(name: String, dir: String): DataFrame =
      QueryRegistry.withExecConfs(spark, name, dir) {
        QueryRegistry.byName(name).fn(spark, dir)
      }
    // ScaleGen's stride definition verbatim (ScaleGen.scala:127-128)
    def stride(table: String, key: String): Long =
      t(spark, smallDir, table).agg(max(col(key)).cast("long"))
        .head().getLong(0) + 1
    lazy val partS = stride("part", "p_partkey")
    lazy val docS = stride("documents", "doc_id")
    lazy val custS = stride("customer", "c_custkey")
    lazy val suppS = stride("supplier", "s_suppkey")

    // ---- generic replica-decomposition check -------------------------
    /** keys: (column, stride) — every key column must land in the SAME
      * replica per row (violations counted), and per-replica base-key
      * sums must equal the small answer's. longCols sum exactly;
      * microCols are per-row round(x·1e6) → long (bit-identical doubles
      * per image ⇒ identical quantization; long sums are exact and
      * order-free); distinctCols compare per-replica distinct counts
      * (character bijections preserve distinctness). */
    def replicaCheck(name: String, keys: Seq[(String, Long)],
                     longCols: Seq[String], microCols: Seq[String],
                     distinctCols: Seq[String] = Nil): String = {
      def measures(keyShift: Map[String, Column]): Seq[Column] =
        Seq(count(lit(1)).as("n")) ++
          longCols.map(c => sum(col(c)).as(s"sum_$c")) ++
          microCols.map(c =>
            sum(round(col(c) * 1e6, 0).cast("long")).as(s"sum_$c")) ++
          keys.map { case (k, _) =>
            sum(keyShift.getOrElse(k, col(k))).as(s"sum_$k") } ++
          distinctCols.map(c => countDistinct(col(c)).as(s"nd_$c"))
      val fields = Seq("n") ++ (longCols ++ microCols).map("sum_" + _) ++
        keys.map("sum_" + _._1) ++ distinctCols.map("nd_" + _)

      val smallRow = runQ(name, smallDir).agg(measures(Map.empty).head,
        measures(Map.empty).tail: _*).head()
      dropCached()
      val (k0, s0) = keys.head
      val big = runQ(name, bigDir)
        .withColumn("__rep", expr(s"$k0 div $s0"))
      val viol = keys.map { case (k, s) =>
        sum(when(expr(s"$k div $s") =!= col("__rep"), 1L).otherwise(0L)) }
        .reduce(_ + _).as("__viol")
      val shifts = keys.map { case (k, s) =>
        k -> (col(k) - col("__rep") * s) }.toMap
      val bigRows = big.groupBy(col("__rep"))
        .agg(measures(shifts).head, (measures(shifts).tail :+ viol): _*)
        .orderBy(col("__rep")).collect()
      dropCached()
      val violations = bigRows.map(_.getAs[Long]("__viol")).sum
      val repsSeen = bigRows.map(_.getAs[Long]("__rep")).toSeq
      val mismatches = bigRows.flatMap { r =>
        fields.filter(f => r.getAs[Long](f) != smallRow.getAs[Long](f))
          .map(f => s""""rep${r.getAs[Long]("__rep")}.$f":[${
            r.getAs[Long](f)},${smallRow.getAs[Long](f)}]""")
      }
      val ok = violations == 0 && repsSeen == (0L until reps.toLong) &&
        mismatches.isEmpty
      s"""{"query":"$name","kind":"replica","reps_seen":${repsSeen.size},""" +
        s""""cross_replica_rows":$violations,""" +
        s""""small":{${fields.map(f =>
          s""""$f":${smallRow.getAs[Long](f)}""").mkString(",")}},""" +
        s""""mismatches":{${mismatches.mkString(",")}},"ok":$ok}"""
    }

    // ---- q121: per-replica conservation ------------------------------
    /** q121 is NOT replica-decomposable row-for-row, and the first probe
      * run PROVED it (reps 8/9 read 4758/4757 survivors vs 4756): LSH
      * band recall is HASH-dependent — the cipher changes shingle hashes,
      * hence minhash values, hence which true pairs a band surfaces — so
      * bijective images legitimately find slightly different subsets of
      * the jaccard>=0.5 pair set, in both directions (replica 0's own
      * banding also misses pairs). That recall profile is part of the
      * DEFINED output (the DuckDB twin implements the identical banding
      * and hash-matches at oracle scales). What IS invariant per replica:
      * total mass — every doc either survives or is absorbed, so
      * survivors + sum(n_dups_merged) == corpus size — plus zero
      * cross-replica rows (cross-replica docs share no shingles), and
      * recall jitter bounded to a handful of pairs. */
    def q121Check(): String = {
      val name = "q121_dedup_canonical"
      val nDocsSmall = t(spark, smallDir, "documents").count()
      val small = runQ(name, smallDir)
        .agg(count(lit(1)).as("n"), sum(col("n_dups_merged")).as("d")).head()
      dropCached()
      val bigRows = runQ(name, bigDir)
        .withColumn("__rep", expr(s"doc_id div $docS"))
        .groupBy(col("__rep"))
        .agg(count(lit(1)).as("n"), sum(col("n_dups_merged")).as("d"))
        .orderBy(col("__rep")).collect()
      dropCached()
      val consOk = bigRows.forall(r =>
        r.getAs[Long]("n") + r.getAs[Long]("d") == nDocsSmall) &&
        small.getAs[Long]("n") + small.getAs[Long]("d") == nDocsSmall
      val maxJitter = bigRows.map(r =>
        math.abs(r.getAs[Long]("n") - small.getAs[Long]("n"))).max
      val ok = consOk && bigRows.length == reps &&
        maxJitter * 1000 <= small.getAs[Long]("n") // <=0.1% band jitter
      s"""{"query":"$name","kind":"replica_conservation",""" +
        s""""reps_seen":${bigRows.length},"corpus_per_rep":$nDocsSmall,""" +
        s""""small_survivors":${small.getAs[Long]("n")},""" +
        s""""per_rep_survivors":[${bigRows.map(_.getAs[Long]("n"))
          .mkString(",")}],"conservation_ok":$consOk,""" +
        s""""max_recall_jitter":$maxJitter,"ok":$ok}"""
    }

    // ---- q145: exact top-50 reconstruction ---------------------------
    def q145Check(): String = {
      val name = "q145_association_rules"
      val small = runQ(name, smallDir).collect()
      val nOrdSmall = t(spark, smallDir, "lineitem")
        .select(col("l_orderkey")).distinct().count()
      dropCached()
      val nOrdBig = reps * nOrdSmall
      // images of every collected small rule under each replica shift,
      // lift re-derived with the scaled n_orders (conf is n-free)
      case class Rule(pa: Long, pb: Long, sp: Long, sa: Long, sb: Long,
                      conf: Long, lift: Long)
      val predAll = for {
        r <- 0 until reps; row <- small
      } yield {
        val conf = row.getAs[Long]("conf_micro")
        Rule(row.getAs[Long]("part_a") + r * partS,
          row.getAs[Long]("part_b") + r * partS,
          row.getAs[Long]("sup_pair"), row.getAs[Long]("sup_a"),
          row.getAs[Long]("sup_b"), conf,
          (conf * nOrdBig) / row.getAs[Long]("sup_b"))
      }
      val pred = predAll.sortBy(x => (-x.lift, x.pa, x.pb)).take(50)
      // completeness caveat: uncollected small rules (rank > 50) have
      // lift' <= the collected 50th's (floor-division order preserved
      // under the xreps multiplier); a TIE at the selection boundary
      // means an uncollected rule's image COULD belong in the true
      // top-50 by the part_a tiebreak. The tie does not void the check:
      // the big ranking is deterministic, so if the true boundary held
      // such an image the MEASURED list would contain a rule absent
      // from the prediction and rows_agree would read false — exact
      // agreement certifies the prediction was complete after the fact
      // (an engine error that lands precisely on an incomplete
      // prediction would need the independently computed big answer to
      // reproduce the small top-50's images, lifts included). The tie
      // is recorded so a reader can tell a guaranteed reconstruction
      // from a post-hoc-certified one. Belt and braces, every measured
      // row's derived columns are re-checked from its own support
      // fields (the arithmetic the engine claims to have done).
      val worstCollected = {
        val last = small.last
        (last.getAs[Long]("conf_micro") * nOrdBig) / last.getAs[Long]("sup_b")
      }
      val boundaryTie = pred.last.lift == worstCollected && small.length >= 50
      val meas = runQ(name, bigDir).collect().map(row =>
        Rule(row.getAs[Long]("part_a"), row.getAs[Long]("part_b"),
          row.getAs[Long]("sup_pair"), row.getAs[Long]("sup_a"),
          row.getAs[Long]("sup_b"), row.getAs[Long]("conf_micro"),
          row.getAs[Long]("lift_micro")))
      dropCached()
      val arithBad = meas.count(r =>
        r.conf != (r.sp * 1000000L) / r.sa ||
          r.lift != (r.conf * nOrdBig) / r.sb)
      val agree = meas.toSeq == pred.toSeq
      val ok = agree && arithBad == 0
      s"""{"query":"$name","kind":"reconstruct_topk","rows":${meas.length},""" +
        s""""n_orders_big":$nOrdBig,"boundary_tie":$boundaryTie,""" +
        s""""arith_bad":$arithBad,"rows_agree":$agree,"ok":$ok}"""
    }

    // ---- q154: cohort symmetry of the top-100 ------------------------
    def q154Check(): String = {
      val name = "q154_pagerank_customer"
      val rows = runQ(name, bigDir).collect()
        .map(r => (r.getAs[Long]("node"), r.getAs[Long]("pr_units")))
      dropCached()
      // node id scheme (GraphOps q154): customers raw, suppliers at
      // -(s_suppkey) - 1; replica/base recovered per sign
      def repOf(node: Long): Long =
        if (node >= 0) node / custS else (-node - 1) / suppS
      def baseOf(node: Long): Long =
        if (node >= 0) node % custS else -((-node - 1) % suppS) - 1
      val sortOk = rows.sliding(2).forall {
        case Array((n1, r1), (n2, r2)) => r1 > r2 || (r1 == r2 && n1 < n2)
        case _ => true
      }
      // resolution marker: at 1000x (165M nodes) the integer mass
      // quantizes to ~6060 units/node and the whole top-100 can TIE on
      // one pr value — the family check then passes vacuously (every
      // singleton family sits at the boundary pr). distinct_pr makes
      // that visible in the artifact instead of reading as 100 verified
      // cohorts; the sort contract (ties by node asc) is still real.
      val distinctPr = rows.map(_._2).distinct.length
      // isomorphic replicas must rank their base nodes identically: every
      // (base, pr_units) family is complete (all `reps` images) except
      // possibly families cut by the top-100 boundary, which the sort
      // contract pins to the minimum pr_units value
      val fams = rows.groupBy { case (n, r) => (baseOf(n), r) }
      val minPr = rows.map(_._2).min
      val broken = fams.collect {
        case ((b, r), f) if f.length != reps && r != minPr =>
          s""""base=$b,pr=$r":${f.length}"""
        case ((b, r), f)
          if f.map(x => repOf(x._1)).toSet.size != f.length =>
          s""""base=$b,pr=$r,dup_rep":${f.length}"""
      }.toSeq
      val ok = sortOk && broken.isEmpty && rows.length == 100
      s"""{"query":"$name","kind":"cohort_symmetry","rows":${rows.length},""" +
        s""""families":${fams.size},"distinct_pr":$distinctPr,""" +
        s""""sort_ok":$sortOk,""" +
        s""""broken_families":{${broken.mkString(",")}},"ok":$ok}"""
    }

    // ---- q133: scaled exact-side prediction --------------------------
    def q133Check(): String = {
      val name = "q133_kmv_set_intersection"
      val s0 = runQ(name, smallDir).head(); dropCached()
      val b0 = runQ(name, bigDir).head(); dropCached()
      def g(r: Row, c: String) = r.getAs[Long](c)
      // Collisions can only MERGE hashes, so the measured exact counts
      // sit AT OR BELOW reps x small — a measured excess would be an
      // engine error and fails one-sidedly. The allowed deficit covers
      // two data effects measured across the decades: 48-bit md5
      // birthday collisions (~n^2/2^49: 75 of 2.7M at sf10, ~1300 of
      // 27M at sf100) and, on the PERM decade only, genuine
      // cross-replica shingle coincidences (a seeded random permutation
      // can alias short vocabulary words; measured 4715 of 27M at
      // sf100) — hence 5e-4 relative, one-sided.
      def near(m: Long, p: Long): Boolean = {
        val d = p - m
        d >= 0 && d <= math.max(2L, p / 2000)
      }
      val pu = reps * g(s0, "exact_union"); val pi = reps * g(s0, "exact_inter")
      val ok = near(g(b0, "exact_union"), pu) && near(g(b0, "exact_inter"), pi) &&
        b0.getAs[Boolean]("union_ok") && b0.getAs[Boolean]("inter_ok") &&
        (g(s0, "k_eff") < 128 || g(b0, "k_eff") == 128)
      s"""{"query":"$name","kind":"scaled_exact",""" +
        s""""exact_union":[${g(b0, "exact_union")},$pu],""" +
        s""""exact_inter":[${g(b0, "exact_inter")},$pi],""" +
        s""""union_ok":${b0.getAs[Boolean]("union_ok")},""" +
        s""""inter_ok":${b0.getAs[Boolean]("inter_ok")},"ok":$ok}"""
    }

    // ---- q90: independent BM25 recomputation -------------------------
    def q90Check(): String = {
      val name = "q90_bm25_retrieval"
      import graft.functions.TextFunctions.tokens
      val terms = Seq("dup", "merge", "vector")
      def corpus(dir: String) = t(spark, dir, "documents")
        .select(col("doc_id"), tokens(lower(col("text"))).as("tk"))
      // global stats by a plain scan (no groupBy pipeline): dl per doc is
      // the token-array size — identical to the query's per-token-count
      // sum because split() never drops elements
      def stats(dir: String): (Long, Long) = {
        val r = corpus(dir)
          .agg(count(lit(1)).cast("long").as("n"),
            sum(size(col("tk"))).cast("long").as("sdl")).head()
        (r.getAs[Long]("n"), r.getAs[Long]("sdl"))
      }
      val (nS, sdlS) = stats(smallDir)
      val (nB, sdlB) = stats(bigDir)
      def dfOf(dir: String): Map[String, Long] = corpus(dir)
        .select(col("doc_id"), explode(col("tk")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("tok"))
        .agg(countDistinct(col("doc_id")).as("df")).collect()
        .map(r => r.getAs[String]("tok") -> r.getAs[Long]("df")).toMap
      val dfS = dfOf(smallDir); val dfB = dfOf(bigDir)
      // matching slice: tiny by construction (terms live in replica 0)
      val slice = corpus(bigDir)
        .select(col("doc_id"), size(col("tk")).cast("long").as("dl"),
          explode(col("tk")).as("tok"))
        .filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("dl"), col("tok"))
        .agg(count(lit(1)).cast("long").as("tf")).collect()
      dropCached()
      val avgdl = sdlB.toDouble / nB
      def idf(df: Long): Long =
        java.lang.Long.toBinaryString((nB + 1) / (df + 1)).length.toLong
      val predDocs = slice.groupBy(_.getAs[Long]("doc_id")).map {
        case (doc, rs) =>
          val score = rs.map { r =>
            val tf = r.getAs[Long]("tf"); val dl = r.getAs[Long]("dl")
            val contrib = idf(dfB(r.getAs[String]("tok"))) *
              ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
            // Spark round(x, 0) is HALF_UP; equals Math.round for
            // positive finite doubles
            Math.round(contrib * 1e6)
          }.sum
          (doc, rs.length.toLong, score)
      }.toSeq
      val pred = predDocs.sortBy(x => (-x._3, x._1)).take(20)
      val meas = runQ(name, bigDir).collect().map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"),
          r.getAs[Long]("score_micro"))).toSeq
      dropCached()
      // df equality across the decade is NOT part of ok: it holds on the
      // rotation/affine decades (ciphers share no words) but a PERM
      // decade's seeded random permutation can alias a short vocabulary
      // word onto a query term (measured at sf100: df("dup") 250 ->
      // 4124). The independent recomputation measures df at the big
      // scale itself, so the top-20 check stays exact either way; the
      // df pairs ride along as data provenance.
      val ok = meas == pred && nB == reps * nS && sdlB == reps * sdlS
      s"""{"query":"$name","kind":"independent_recompute",""" +
        s""""n":[$nB,${reps * nS}],"sum_dl":[$sdlB,${reps * sdlS}],""" +
        s""""df":{${terms.map(tm => s""""$tm":[${dfB.getOrElse(tm, 0L)},${
          dfS.getOrElse(tm, 0L)}]""").mkString(",")}},""" +
        s""""top20_agree":${meas == pred},"ok":$ok}"""
    }

    // ---- q120: witness re-score through a keyed join ------------------
    def q120Check(): String = {
      val name = "q120_semantic_decontam"
      val out = runQ(name, bigDir).localCheckpoint()
      val fx = transform(col("embedding"),
        x => round(x.cast("double") * 1000000L).cast("long"))
      val ev = t(spark, bigDir, "embeddings")
        .select(col("vec_id"), fx.as("e"))
        .withColumn("nn", aggregate(transform(col("e"), x => x * x),
          lit(0L), (acc, x) => acc + x).cast("double"))
      val re = out
        .join(ev.select(col("vec_id"), col("e").as("te"), col("nn").as("tn")),
          Seq("vec_id"))
        .join(ev.select(col("vec_id").as("eval_id"), col("e").as("qe"),
          col("nn").as("qn")), Seq("eval_id"))
        .withColumn("score2", round(
          aggregate(zip_with(col("te"), col("qe"), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x).cast("double") /
            sqrt(col("tn") * col("qn")), 6))
        .agg(count(lit(1)).as("n"),
          sum(when(col("score2") =!= col("score") ||
            col("score") < 0.35 ||
            col("vec_id") % 97 === 0 || col("eval_id") % 97 =!= 0,
            1L).otherwise(0L)).as("bad")).head()
      dropCached()
      val ok = re.getAs[Long]("bad") == 0 && re.getAs[Long]("n") > 0
      s"""{"query":"$name","kind":"witness_rescore",""" +
        s""""rows":${re.getAs[Long]("n")},"bad":${re.getAs[Long]("bad")},""" +
        s""""ok":$ok}"""
    }

    // ---- q106: witness re-derivation of every surviving doc -----------
    def q106Check(): String = {
      val name = "q106_curation_pipeline_e2e"
      import graft.functions.HashFunctions.shingles
      import graft.functions.expressions.TokenMetrics.token_metrics
      val out = runQ(name, bigDir).localCheckpoint()
      val docs = t(spark, bigDir, "documents")
        .select(col("doc_id"), col("text"))
      val joined = out.join(docs, Seq("doc_id"))
        .withColumn("tk", split(col("text"), " "))
        .withColumn("m", token_metrics(split(col("text"), " ")))
      val nTok = col("m.n_tokens")
      val uniq = col("m.uniq_tokens").cast("double") / nTok
      val meanW = (length(col("text")) - nTok + 1).cast("double") / nTok
      val topF = col("m.top_token_count").cast("double") / nTok
      val dup3 = lit(1.0) -
        col("m.uniq_trigrams").cast("double") / (nTok - 2)
      val top2 = col("m.top_bigram_count").cast("double") / (nTok - 1)
      val bucket = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":split"))), 1, 8), 16, 10).cast("long") % 10
      val filtersOk = nTok >= 20 && uniq >= 0.5 && topF <= 0.2 &&
        meanW.between(3, 6) && dup3 <= 0.6 && top2 <= 0.2
      val splitOk = col("split") === when(bucket <= 7, lit("train"))
        .when(bucket === 8, lit("val")).otherwise(lit("test"))
      val pw = Window.partitionBy(col("split"), col("source"))
        .orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
      val winOk = col("window_id") ===
        floor(coalesce(sum(col("n_tokens")).over(pw), lit(0L)) /
          lit(graft.operators.AssemblyOps.WindowTokens)).cast("long")
      val base = joined
        .withColumn("row_ok", filtersOk && splitOk &&
          col("doc_id") % 97 =!= 0 &&
          col("n_tokens") === nTok.cast("long"))
        .withColumn("win_ok", winOk)
      val a = base.agg(count(lit(1)).as("n"),
        sum(when(!col("row_ok"), 1L).otherwise(0L)).as("bad_rows"),
        sum(when(!col("win_ok"), 1L).otherwise(0L)).as("bad_windows"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("dup_fps"))
        .head()
      // decontamination witness: surviving docs share no shingle with the
      // eval slice (membership re-derived at THIS scale's id space)
      val evalSh = docs
        .withColumn("tk", split(col("text"), " "))
        .filter(size(col("tk")) >= 3 && col("doc_id") % 97 === 0)
        .select(explode(shingles(col("tk"))).as("sg")).distinct()
      val contamHits = joined
        .select(col("doc_id"), explode(shingles(col("tk"))).as("sg"))
        .join(broadcast(evalSh), Seq("sg")).count()
      dropCached()
      val ok = a.getAs[Long]("bad_rows") == 0 &&
        a.getAs[Long]("bad_windows") == 0 &&
        a.getAs[Long]("dup_fps") == 0 && contamHits == 0 &&
        a.getAs[Long]("n") > 0
      s"""{"query":"$name","kind":"witness_pipeline",""" +
        s""""rows":${a.getAs[Long]("n")},"bad_rows":${
          a.getAs[Long]("bad_rows")},""" +
        s""""bad_windows":${a.getAs[Long]("bad_windows")},""" +
        s""""dup_fingerprints":${a.getAs[Long]("dup_fps")},""" +
        s""""eval_shingle_hits":$contamHits,"ok":$ok}"""
    }

    val checks: Seq[(String, () => String)] = Seq(
      "q121_dedup_canonical" -> (() => q121Check()),
      "q46_ratcliff_fuzzy_pairs" -> (() =>
        replicaCheck("q46_ratcliff_fuzzy_pairs",
          Seq("a_key" -> partS, "b_key" -> partS), Nil, Seq("ratio"),
          Seq("p_brand"))),
      "q77_fuzzy_near_miss_debug" -> (() =>
        replicaCheck("q77_fuzzy_near_miss_debug",
          Seq("a_key" -> partS, "b_key" -> partS), Nil, Seq("sim"),
          Seq("p_brand"))),
      "q79_passjoin_k2_varlen" -> (() =>
        replicaCheck("q79_passjoin_k2_varlen",
          Seq("a_key" -> partS, "b_key" -> partS), Seq("lev"), Nil)),
      "q145_association_rules" -> (() => q145Check()),
      "q154_pagerank_customer" -> (() => q154Check()),
      "q133_kmv_set_intersection" -> (() => q133Check()),
      "q90_bm25_retrieval" -> (() => q90Check()),
      "q120_semantic_decontam" -> (() => q120Check()),
      "q106_curation_pipeline_e2e" -> (() => q106Check()))

    var failed = 0
    val rows = checks.filter(c => only.isEmpty || only(c._1)).map {
      case (n, f) =>
        val t0 = System.nanoTime()
        val cell = try {
          val json = f()
          if (!json.contains(""""ok":true""")) failed += 1
          json.stripSuffix("}") +
            s""","secs":${f3((System.nanoTime() - t0) / 1e9)}}"""
        } catch { case e: Throwable =>
          failed += 1
          val msg = (e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(200))
            .replaceAll("[\"\\\\\n\r\t]", " ")
          s"""{"query":"$n","err":"$msg","ok":false,"secs":${
            f3((System.nanoTime() - t0) / 1e9)}}"""
        }
        println(s"PRED $cell")
        cell
    }
    val doc = s"""{"metric":"predicted_values","small":"$smallDir",""" +
      s""""big":"$bigDir","reps":$reps,"checks":${rows.size},""" +
      s""""failed":$failed,"results":[${rows.mkString(",")}]}"""
    println(s"PREDJSON $doc")
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        doc.getBytes("UTF-8")): Unit
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
