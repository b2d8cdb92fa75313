package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}
import graft.queries.{ParityQueries, Tables}

/** Plan-shape audits: the properties that matter at 100 TB, asserted on the
  * actual physical plans rather than trusted from scaladoc — column pruning
  * and predicate pushdown reaching the parquet scan, broadcast joins on
  * dimension sides, two-phase (map-side combine) aggregation, whole-stage
  * codegen coverage, and the absence of cartesian / nested-loop joins in
  * the bucketed candidate-pair plans.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q01: unused wide columns are pruned at the scan; aggregation is two-phase") {
    val plan = planOf(ParityQueries.q01PricingSummary(spark, Sf0001))
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_comment"), s"unused wide column not pruned:\n$plan")
    // partial + final HashAggregate = the shuffle carries combined partials,
    // not raw rows
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q02: all three dimension joins broadcast (no dim-side shuffle)") {
    val plan = planOf(ParityQueries.q02StarJoin(spark, Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
  }

  test("a predicate on a scan column is pushed into the parquet reader") {
    val plan = planOf(
      Tables.events(spark, Sf0001)
        .filter(col("event_type") === "signup")
        .select("event_id"))
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(event_type,signup)"),
      s"filter did not reach the scan:\n$plan")
  }

  test("q01 executes inside whole-stage codegen") {
    // AQE finalizes the physical plan at execution, so run the query first;
    // generated stages are then starred in the plan string: "*(n) HashAggregate"
    val df = ParityQueries.q01PricingSummary(spark, Sf0001)
    df.collect() // count() would execute a DIFFERENT (re-planned) query
    val plan = planOf(df)
    assert(plan.contains("*("), s"no whole-stage codegen spans:\n$plan")
  }

  test("bucketed pair plans never degrade to cartesian / nested-loop joins") {
    val docs = Tables.documents(spark, Sf0001)
    Seq(
      Dedup.minhashNearDups(docs),
      Dedup.simhashNearDups(docs),
      Dedup.ngramJaccardPairs(docs, blockCols = Seq("lang"))
    ).foreach { df =>
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"candidate generation fell back to an all-pairs join:\n$plan")
    }
  }

  test("q30: the query side broadcasts so the corpus is scored map-side") {
    val e = Tables.embeddings(spark, Sf0001)
    val plan = planOf(Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 4), 3))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q30: top-k reduction is the bounded-state heap aggregate, not a window sort") {
    // row_number() OVER (PARTITION BY q_id ...) would shuffle+sort the whole
    // |Q|·|corpus| scored cross product; collectTopK ships k rows per
    // (partition, query). ObjectHashAggregate = the TypedImperativeAggregate
    // path; no Window and no Sort node may appear anywhere in the plan
    // (sort_array on the k-element output array is an expression, not a node).
    val e = Tables.embeddings(spark, Sf0001)
    val plan = planOf(Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 4), 3))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), s"window sort crept back into the exact tier:\n$plan")
    assert(!"(?m)^\\s*[*+:-]*\\(?\\d*\\)?\\s*Sort ".r.findFirstIn(plan).isDefined,
      s"full sort in the exact tier plan:\n$plan")
  }

  test("q45/q126 stratified quota: bounded-state heap aggregate, not a per-stratum window sort") {
    // the per-key sampler ships k rows per (partition, stratum) through the
    // shuffle; a row_number window would sort every stratum in full — the
    // hottest user's whole event history through one task
    val plan = planOf(graft.ext.Sampling.stratifiedQuota(
      Tables.events(spark, Sf0001).select(col("user_id"), col("event_id")),
      strataCols = Seq("user_id"), perStratum = 8, idCol = "event_id"))
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), s"window sort crept into the sampler:\n$plan")
  }

  test("q55 repetition: pruned scan, two-phase aggregation at both levels") {
    val plan = planOf(graft.ext.TextAnalysis.repetitionStats(
      Tables.documents(spark, Sf0001)))
    // only (doc_id, text) leave the scan
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("source") && !plan.contains("lang"),
      s"unused columns not pruned:\n$plan")
    // (doc,bigram) counts and the per-doc max both combine map-side before
    // their shuffles — at 100 TB the exchange carries partials, not bigrams
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("q54 redaction executes inside whole-stage codegen (no interpreted regex stage)") {
    val df = graft.ext.ExtQueries.q54PiiRedact(spark, Sf0001)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("*("), s"no whole-stage codegen spans:\n$plan")
  }

  test("q75 commonness: corpus shuffle carries (doc,term) partials, not raw tokens") {
    val plan = planOf(graft.ext.TextAnalysis.commonnessScore(
      Tables.documents(spark, Sf0001)))
    // tf, term-dictionary, per-doc and total aggregates all two-phase
    assert("HashAggregate".r.findAllIn(plan).size >= 6, plan)
    assert(!plan.contains("CartesianProduct"),
      s"scalar total should broadcast, not cartesian:\n$plan")
  }

  test("q76 collocations: global top-N is TakeOrderedAndProject, never a full sort") {
    val plan = planOf(graft.ext.TextAnalysis.collocations(
      Tables.documents(spark, Sf0001), minCount = 2L, topN = 50))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-N fell back to a global sort:\n$plan")
  }

  test("q74 semantic dedup: bucketed pair join, removal via shuffle-free-id anti join") {
    val e = Tables.embeddings(spark, Sf0001)
    val plan = planOf(Similarity.semanticDedup(e, blockCol = "label", threshold = 0.25))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"candidate generation fell back to an all-pairs join:\n$plan")
    assert(plan.contains("LeftAnti"), s"removal set should anti-join:\n$plan")
  }

  test("q79 rolling features: one window pass, no self-join") {
    val plan = planOf(graft.queries.EventQueries.q79RollingFeatures(spark, Sf0001))
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"trailing-window features must not plan a self-join:\n$plan")
  }

  test("q03 rank filter pushes down to WindowGroupLimit (partial top-k per partition)") {
    val plan = planOf(ParityQueries.q03WindowTopOrders(spark, Sf0001))
    // rn <= 3 must become a pre-shuffle group limit: each map task forwards
    // at most k rows per customer instead of the whole partition — the
    // difference between shuffling top-k and shuffling everything at 100 TB
    assert(plan.contains("WindowGroupLimit"),
      s"rank limit not pushed below the window sort:\n$plan")
  }

  test("q82 grouping sets: one scan + Expand, not one aggregation per set") {
    val plan = planOf(ParityQueries.q82GroupingSets(spark, Sf0001))
    assert(plan.contains("Expand"), s"grouping sets should plan Expand:\n$plan")
    // a per-set union would scan orders three times
    assert("Scan parquet".r.findAllIn(plan).size <= 1,
      s"grouping sets re-scanned the table:\n$plan")
  }

  test("q84 correlated scalar subquery decorrelates to an aggregate join") {
    val plan = planOf(ParityQueries.q84AboveCustomerAvg(spark, Sf0001))
    // Catalyst must rewrite the per-row subquery to a per-customer aggregate
    // joined back — a correlated re-scan per row cannot survive at scale
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Join") || plan.contains("join"), plan)
    assert(!plan.contains("CartesianProduct"), s"subquery fell back to cartesian:\n$plan")
  }

  test("q95 edit distance: bucketed pair join with the injected length guard") {
    val df = Dedup.editDistancePairs(
      Tables.documents(spark, Sf0001), blockCols = Seq("lang"), maxDist = 25)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"pair generation fell back to an all-pairs join:\n$plan")
    // the O(n^2) dynamic program must be evaluated EXACTLY ONCE per pair —
    // inside the aggregate — not re-inlined into a filter/join predicate by
    // alias substitution (that would run the DP twice per surviving pair).
    // One Aggregate node in the optimized plan carries it...
    val optimized = df.queryExecution.optimizedPlan.toString
    assert("levenshtein".r.findAllIn(optimized).size == 1,
      s"levenshtein must be evaluated exactly once:\n$optimized")
    // ...and no physical Filter/Join re-evaluates it (the two HashAggregate
    // mentions are partial eval + final merge of the SAME per-row value)
    assert(!plan.linesIterator.exists(l =>
      l.contains("levenshtein") && (l.contains("Filter") || l.contains("Join"))),
      s"levenshtein leaked back into a predicate:\n$plan")
    // the constant-time length lower bound still gates candidates before
    // any DP runs
    assert(plan.contains("abs(") && plan.contains("length("),
      s"length-difference guard missing:\n$plan")
  }

  test("q102 composed pipeline keeps every stage's plan contract") {
    val plan = planOf(graft.ext.ExtQueries.q102CurationPipeline(spark, Sf0001))
    // composition must not reintroduce what the stages individually avoid
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"composition degraded to an all-pairs join:\n$plan")
    // packing's two-level prefix sum: the only global-order window runs on
    // the per-GROUP totals, so a GLOBAL row sort never appears (join-local
    // SMJ sorts carry `, false` — only `, true` is a corpus-wide sort)
    assert(!"Sort \\[doc_id[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
      s"corpus-wide sort leaked in:\n$plan")
  }

  test("q111 salted distinct: both stages two-phase, no single-reducer distinct") {
    val plan = planOf(graft.ext.Skew.saltedDistinctCount(
      Tables.events(spark, Sf0001), Seq("event_type"), "user_id", salts = 16))
    // stage 1 (key, salt) count-distinct + stage 2 per-key sum, each with
    // map-side partials = 4+ HashAggregates; the hot key's distinct merge
    // spreads over the salt space instead of one reducer
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("q114/q121 scalar anchors broadcast — no shuffle to attach one row") {
    val p114 = planOf(graft.queries.EventQueries.q114DecayedScore(spark, Sf0001))
    assert(p114.contains("BroadcastNestedLoopJoin") || p114.contains("BroadcastExchange"),
      s"max-day anchor should broadcast:\n$p114")
    val p121 = planOf(graft.queries.EventQueries.q121TemporalSplit(spark, Sf0001))
    assert(p121.contains("BroadcastNestedLoopJoin") || p121.contains("BroadcastExchange"),
      s"quantile boundary should broadcast:\n$p121")
  }

  test("q136 LOCF: join and carry window reuse the user_id shuffles — no extra Exchange") {
    // daily aggregates shuffle on (user_id, day) and user_id; the left join
    // and the running window both require only co-location on user_id,
    // which those partitionings already satisfy (subset rule) — so the
    // whole fill costs exactly the two aggregation exchanges.
    val plan = planOf(graft.queries.EventQueries.q136Locf(spark, Sf0001))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"missing the carry window:\n$plan")
  }

  test("q137 transitions: one event-stream shuffle; ppm window runs on the matrix, not the stream") {
    val plan = planOf(graft.queries.EventQueries.q137Transitions(spark, Sf0001))
    // two-phase bigram aggregate (partial above the lead window, final after
    // the (src, dst) exchange) — the stream itself shuffles once (user_id)
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 hash exchanges (user_id, (src,dst), src):\n$plan")
  }

  test("q138 winsorize: percentile anchor broadcasts; the stream never shuffles") {
    val plan = planOf(graft.queries.EventQueries.q138Winsorize(spark, Sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"p05/p95 anchor should broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"the clip must be map-side — no hash exchange of the event stream:\n$plan")
  }

  test("q140 journeys: sessionize windows and path aggregate ride one user_id shuffle") {
    val plan = planOf(graft.queries.EventQueries.q140TopJourneys(spark, Sf0001))
    // user_id exchange (both windows + the per-session path aggregate all
    // satisfy their clustering from it, subset rule) + the bounded-domain
    // path-count exchange — nothing else
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$plan")
  }

  test("q139 overlap: pair intersections join model-sized sketch tables, never the stream") {
    val plan = planOf(graft.queries.EventQueries.q139AudienceOverlap(spark, Sf0001))
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
    // the |types|x|types| sketch pairing is a broadcast of the 5-row
    // sketch relation, not a shuffle of event rows
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"sketch pair join should broadcast:\n$plan")
  }

  test("q141 drift: anchors broadcast; the stream shuffles only (bin, count) pairs") {
    val plan = planOf(graft.queries.EventQueries.q141DriftReport(spark, Sf0001))
    // day-midpoint and ref-min/max anchors are 1-row broadcast relations
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"scalar anchors should broadcast:\n$plan")
    // the only hash exchange carries 10 (bin, partial-count) rows; the
    // divergence windows then run single-partition over the 10-row table
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected <=1 hash exchange (bin), got $exchanges:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"bin counts should combine map-side:\n$plan")
  }

  test("q142 z-test: arm assignment is scan-time; two bounded aggregates, no window") {
    val plan = planOf(graft.queries.EventQueries.q142AbZtest(spark, Sf0001))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected <=2 hash exchanges (user_id, arm), got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"the fold needs no window:\n$plan")
  }

  test("q143 stickiness: the (day,user) distinct is the only data-sized shuffle") {
    val plan = planOf(graft.queries.EventQueries.q143Stickiness(spark, Sf0001))
    // distinct + the two-distinct weekly aggregate (Expand) — everything
    // after the pair distinct operates on user-day pairs, never raw events
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("q144 cohort LTV: cohort sizes broadcast; cumulative window runs per cohort") {
    val plan = planOf(graft.queries.EventQueries.q144CohortLtv(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"cohort-size relation should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    // window partitions by cohort_week — never a global sort
    assert(plan.contains("Window"), plan)
  }

  test("q145 novelty reads the corpus once: single scan, window df, no join") {
    val plan = planOf(graft.ext.TextAnalysis.ngramNovelty(
      Tables.documents(spark, Sf0001)))
    // the groupBy-plus-self-join formulation scans and explodes the corpus
    // twice; the window formulation must keep exactly one parquet scan
    assert("Scan parquet".r.findAllIn(plan).size === 1,
      s"novelty must not re-scan the corpus for the df side:\n$plan")
    assert(!plan.contains("Join"), s"df must come from a window, not a join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("q147 oov: induced vocab is broadcast; the per-token side never sorts") {
    val plan = planOf(graft.ext.TextAnalysis.oovRate(
      Tables.documents(spark, Sf0001), topN = 50))
    assert(plan.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$plan")
    // top-N induction must be partial per-partition top-N, not a global sort
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab induction should plan TakeOrderedAndProject:\n$plan")
  }

  test("q154 triangles: staged edge set, equi-joins only, no cartesian") {
    val plan = planOf(ParityQueries.q154Triangles(spark, Sf0001))
    // the canonical edge set and the oriented set are staged once
    // (localCheckpoint → ExistingRDD scans), so the gated pair-join subtree
    // is not re-derived once per consumer
    assert(plan.contains("ExistingRDD"), s"edge set not staged:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"triangle join degraded to a product:\n$plan")
    // wedge + closing joins are hash-partitioned equi-joins on node keys
    assert("SortMergeJoin|BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("q155 cross-source: two-phase distinct; pair join on the fingerprint key") {
    val plan = planOf(graft.ext.ExtQueries.q155CrossSource(spark, Sf0001))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the (fingerprint, source) distinct is a partial+final HashAggregate
    // pair on each side — the shuffle carries collapsed rows, not the corpus
    assert("HashAggregate".r.findAllIn(plan).size >= 4, plan)
  }

  test("q159 concurrency sweep: one sessionize pass feeds both boundary kinds") {
    val plan = planOf(graft.queries.EventQueries.q159MaxConcurrent(spark, Sf0001))
    // the sessionize + boundary-explode subtree runs ONCE, at the prefix
    // sum's staging step — the remaining plan reads the staged blocks
    // (ExistingRDD) in both the sweep arm and the group-prefix arm, so no
    // event scan or user_id window can appear in it at all
    assert(plan.contains("ExistingRDD"), s"prefix-sum stage not staged:\n$plan")
    assert(!plan.contains("FileScan"),
      s"events re-scanned downstream of the staged boundaries:\n$plan")
    assert(!plan.contains("windowspecdefinition(user_id"),
      s"sessionize re-derived downstream of the staged boundaries:\n$plan")
  }

  test("prefix-sum operators scan the corpus exactly once (q58 staging)") {
    // the within-group cumsum (scan + tokenize + window) runs once, at
    // staging — both step-2 consumers read the blocks, so the query plan
    // itself contains NO parquet scan (left lazy, the join and group-total
    // arms each re-scanned + re-tokenized the corpus: exchange reuse is
    // defeated by the join side's isnotnull key filter)
    val plan = planOf(graft.ext.ExtQueries.q58TokenPack(spark, Sf0001))
    assert("Scan ExistingRDD".r.findAllIn(plan).size >= 2,
      s"both prefix-sum arms should read the staged blocks:\n$plan")
    assert(!plan.contains("FileScan"),
      s"corpus re-scanned downstream of the staged cumsum:\n$plan")
  }

  test("q163 RFM: quartile thresholds and max-day broadcast; no global-order window") {
    val plan = planOf(graft.queries.EventQueries.q163RfmSegments(spark, Sf0001))
    // the 1-row anchors attach via broadcast nested-loop, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"1-row anchors should broadcast:\n$plan")
    // ntile-free construction: no Window operator anywhere in the plan
    assert(!plan.contains("Window"),
      s"score assignment must not use a global-order window:\n$plan")
  }

  test("q165 basket pair join stays equi-keyed on the basket id; singles broadcast") {
    val plan = planOf(graft.queries.EventQueries.q165MarketBasket(spark, Sf0001))
    // the self-join must hash on (user_id, day) — the type inequality rides
    // as a residual condition, never the join itself (that would be the
    // all-pairs O(rows²) shape). At test SF the small side broadcasts; at
    // scale the identical subtrees shuffle once and reuse the exchange —
    // either way the keys are the basket id.
    assert(plan.contains("Join [user_id") || plan.contains("ReusedExchange"),
      s"pair join should key on the basket id:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"singles lookups should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin BuildRight, Inner"),
      s"pair generation degraded to a non-equi join:\n$plan")
  }

  test("q166 seasonal baseline broadcasts back onto the daily stream") {
    val plan = planOf(graft.queries.EventQueries.q166SeasonalAnomaly(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"the |types|x7 baseline must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no data-sized shuffle join:\n$plan")
  }

  test("q168 decay head is a top-k heap, not a global vocabulary sort") {
    val plan = planOf(graft.ext.ExtQueries.q168FreqDecay(spark, Sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-1024 head should be the bounded heap operator:\n$plan")
  }

  test("q170 posting truncation runs as WindowGroupLimit before any collect") {
    val plan = planOf(graft.ext.ExtQueries.q170PostingLists(spark, Sf0001))
    // rn <= 5 must push into the window as a per-partition group limit, so
    // a stopword term never materializes its full posting list
    assert(plan.contains("WindowGroupLimit"),
      s"posting truncation should push into the window operator:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"final top-100 should be the bounded heap operator:\n$plan")
  }

  test("q171 zone maps: bounds broadcast; no join wider than the model tables") {
    val plan = planOf(graft.ext.ExtQueries.q171ZoneMaps(spark, Sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"1-row predicate bounds should broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("q173 local-supplier star: four dims broadcast, date filter pushed to the orders scan") {
    val plan = planOf(ParityQueries.q173LocalSupplierRevenue(spark, Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"customer/supplier/nation/region should all broadcast:\n$plan")
    // year(o_orderdate) BETWEEN ... must filter before the lineitem join
    // (renders as year(cast(o_orderdate as date)) in the scan's DataFilters)
    assert(plan.contains("year(cast(o_orderdate"),
      s"date window not applied below the join:\n$plan")
  }

  test("q213 volume shipping: both nation chains broadcast; one orderkey shuffle join") {
    val plan = planOf(ParityQueries.q213VolumeShipping(spark, Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"supplier-nation and customer-nation chains should both broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q215 waiting supplier: self semi- and anti-join both key on l_orderkey") {
    val plan = planOf(ParityQueries.q215WaitingSupplier(spark, Sf0001))
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"Q21 algebra must plan as semi+anti joins, not aggregates:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the non-equi suppkey predicate must ride the orderkey equi-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 should be the bounded heap operator:\n$plan")
  }

  test("q218 encoding advisor: run windows are partitioned by (column, page)") {
    val plan = planOf(graft.ext.ExtQueries.q218EncodingAdvisor(spark, Sf0001))
    // the lag window must be keyed by (col_name, page) — an unkeyed window
    // would drag the whole unpivoted table through one partition
    assert("Window \\[[^\\n]*\\[col_name#\\d+, page#\\d+L?\\]".r
      .findFirstIn(plan).isDefined,
      s"run-count window should partition by (col_name, page):\n$plan")
  }

  test("q220 attribution windows are user-keyed; credit rollup is two-phase") {
    val plan = planOf(graft.queries.EventQueries.q220PositionAttribution(spark, Sf0001))
    assert(plan.contains("user_id#"), plan)
    // no unpartitioned window anywhere: every Window operator must carry a
    // partition spec (an empty one renders as "Window [..], [..ORDER BY..]"
    // with no partition list — assert the user_id key is in each)
    "Window \\[[^\\n]*\\]".r.findAllIn(plan).foreach { w =>
      assert(w.contains("user_id"), s"unkeyed window:\n$w")
    }
  }

  test("q222 sequence support: envelope self-join keys on user_id, anchors broadcast") {
    val plan = planOf(graft.queries.EventQueries.q222SequenceSupport(spark, Sf0001))
    assert(!plan.contains("CartesianProduct") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"types-pair expansion must ride the user_id equi-join:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 1-row user-count anchor should broadcast:\n$plan")
  }

  test("q232 target encoding: the |types| stats relation broadcasts") {
    val plan = planOf(graft.queries.EventQueries.q232TargetEncoding(spark, Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"5-row stats must broadcast back over the event stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no data-sized shuffle join:\n$plan")
  }

  test("q235 big orders: bounded top-100 heap; customer dim broadcast") {
    val plan = planOf(ParityQueries.q235BigOrders(spark, Sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-100 should be the bounded heap operator:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).nonEmpty,
      s"customer should broadcast:\n$plan")
  }

  test("q191 partition-column predicate lands in PartitionFilters, not the data scan") {
    val plan = planOf(ParityQueries.q191PartitionedWrite(spark, Sf0001))
    // directory-level pruning: the day predicate must be a partition filter
    // (skips whole dirs before any footer is read), never a row filter
    assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(plan).isDefined,
      s"day predicate did not reach PartitionFilters:\n$plan")
  }

  test("q200 recency truncation runs as WindowGroupLimit before any collect") {
    val plan = planOf(graft.queries.EventQueries.q200RecentHistory(spark, Sf0001))
    assert(plan.contains("WindowGroupLimit"),
      s"rn <= 3 should push into the window as a group limit:\n$plan")
  }

  test("q183 attribution pair join keys on user_id; no cartesian anywhere") {
    val plan = planOf(graft.queries.EventQueries.q183LinearAttribution(spark, Sf0001))
    assert(plan.contains("Join [user_id") || plan.contains("Join [conv_id") ||
      plan.contains("BroadcastHashJoin"),
      s"pair join should be hash-keyed:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q190 change-point anchors broadcast; the daily stream joins hash-keyed") {
    val plan = planOf(graft.queries.EventQueries.q190ChangePoint(spark, Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"per-type stats and peaks must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"), plan)
  }

  test("q244 lateness predicate rides the semi-join as a residual, orders prune first") {
    val plan = planOf(ParityQueries.q244PriorityCheck(spark, Sf0001))
    assert(plan.contains("LeftSemi"), s"EXISTS must plan as a semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q245 profit star: part/supplier/nation broadcast; one orderkey shuffle") {
    val plan = planOf(ParityQueries.q245ProductProfit(spark, Sf0001))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      s"the three dimension joins must broadcast:\n$plan")
  }

  test("q251 disjunctive part predicate is pushed to the part scan as one Or filter") {
    val plan = planOf(ParityQueries.q251DisjunctRevenue(spark, Sf0001))
    assert(plan.contains("PushedFilters") && plan.contains("Or("),
      s"the OR-of-ANDs must reach the parquet reader:\n$plan")
  }

  test("q254 per-part rank-1 runs as WindowGroupLimit over the contracted offers") {
    val plan = planOf(ParityQueries.q254MinCostSupplier(spark, Sf0001))
    assert(plan.contains("WindowGroupLimit"),
      s"rank()=1 must push into WindowGroupLimit:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
  }

  test("q257 lag chain, forward rank and last-row pick share one user_id exchange") {
    val plan = planOf(graft.queries.EventQueries.q257EmaFeature(spark, Sf0001))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"all window arms must reuse the single user_id shuffle:\n$plan")
  }

  test("q255/q259 iterative-label and prefix-candidate joins stay hash-keyed") {
    Seq(
      ParityQueries.q255LabelCommunities(spark, Sf0001),
      Dedup.prefixFilterJaccardPairs(Tables.documents(spark, Sf0001))
    ).foreach { df =>
      val plan = planOf(df)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"pair/label joins must be equi-joins:\n$plan")
    }
  }

  test("q260/q262 top-k runs as the bounded TakeOrderedAndProject heap") {
    Seq(
      ParityQueries.q260ShippingPriority(spark, Sf0001),
      ParityQueries.q262ReturnedItems(spark, Sf0001)
    ).foreach { df =>
      val plan = planOf(df)
      assert(plan.contains("TakeOrderedAndProject"),
        s"ORDER BY + LIMIT must plan as the bounded heap, not a global sort:\n$plan")
    }
  }

  test("q263 skyline sweeps the distinct-point contraction, not raw parts") {
    val plan = planOf(ParityQueries.q263PartSkyline(spark, Sf0001))
    // the Window's child must be the (price, size) aggregate — two-phase
    // HashAggregate below the Window node
    val winIdx = plan.indexOf("Window")
    assert(winIdx >= 0 && plan.indexOf("HashAggregate", winIdx) >= 0,
      s"the sweep must run over the contracted point set:\n$plan")
  }

  test("q280 bitmap packs with two-phase bit_or on one user_id exchange") {
    val plan = planOf(graft.queries.EventQueries.q280ActivityBitmap(spark, Sf0001))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"bit_or must partial-aggregate map-side:\n$plan")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1, plan)
  }

  test("q285 also-bought rank-3 cut runs inside WindowGroupLimit") {
    val plan = planOf(ParityQueries.q285AlsoBought(spark, Sf0001))
    assert(plan.contains("WindowGroupLimit"),
      s"the top-3 cut must bound state per key:\n$plan")
  }

  test("q294 forget sweep: semi and anti arms both broadcast the forget-set") {
    val plan = planOf(graft.queries.EventQueries.q294ForgetAudit(spark, Sf0001))
    assert("BroadcastHashJoin.*LeftSemi".r.findAllIn(plan).nonEmpty &&
      "BroadcastHashJoin.*LeftAnti".r.findAllIn(plan).nonEmpty,
      s"forget-set must broadcast into both arms:\n$plan")
  }

  test("IVF indexed probe plans dynamic partition pruning on the inverted file") {
    withTempDir("plan-ivf") { dir =>
      val e = Tables.embeddings(spark, Sf0001)
      Similarity.writeIvfIndex(e, dir.toString)
      val q = Similarity.ivfTopKIndexed(e.filter(col("vec_id") < 4), dir.toString, k = 3)
      val plan = planOf(q)
      // the cell equi-join against the broadcast query side must reach the
      // cell-partitioned scan as a runtime partition filter — the property
      // that lets a probe skip unprobed cells of a 100 TB inverted file
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic partition pruning on the inverted-file scan:\n$plan")
      // the centroid model rides a broadcast relation (a nested-loop join
      // against the O(cells) local relation), never per-centroid literal
      // expression branches — the form that scales cells to √N
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"centroid scoring should be a broadcast model join:\n$plan")
    }
  }

  test("q299 encode pass: columnar replace chain, two-phase per-source agg") {
    val plan = planOf(graft.ext.ExtQueries.q299BpeEncode(spark, Sf0001))
    // the five-merge chain must stay a scalar expression over the exploded
    // tokens — no join against a merges table, no per-row interpretation
    assert(!plan.contains("Join"), s"encode must not join a merge table:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"per-source totals must partial-aggregate map-side:\n$plan")
    assert("Exchange hashpartitioning\\(source".r.findAllIn(plan).size == 1,
      s"encode should cost exactly one source exchange:\n$plan")
  }

  test("q303 bootstrap: purchase filter reaches the scan; 16-way explode combines map-side") {
    val plan = planOf(graft.queries.EventQueries.q303PoissonBootstrap(spark, Sf0001))
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,purchase)"),
      s"purchase filter must push into the parquet reader:\n$plan")
    // all 16 replicas ride one scan: a single Generate, then two-phase agg
    assert("Generate explode".r.findAllIn(plan).size == 1, plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"replica sums must partial-aggregate before the 16-group exchange:\n$plan")
  }

  test("q313 advisor: numeric columns are never read — scans prune to strings") {
    val plan = planOf(graft.queries.ParityQueries.q313BroadcastAdvisor(spark, Sf0001))
    // the size model needs count(*) + string lengths only; reading the
    // numeric columns would defeat the pruning the report exists to prove
    assert(!plan.contains("r_regionkey") && !plan.contains("o_totalprice"),
      s"numeric columns must be pruned from the advisor scans:\n$plan")
    assert(plan.contains("ReadSchema"), plan)
  }

  test("q312 decay pairs join on user_id, never cartesian; q319 grid broadcasts") {
    val p312 = planOf(graft.queries.EventQueries.q312TimeDecayAttribution(spark, Sf0001))
    assert(!p312.contains("CartesianProduct"),
      s"touch-conversion pairing must key on user_id:\n$p312")
    val p319 = planOf(graft.queries.EventQueries.q319SequentialTest(spark, Sf0001))
    // the 4-row interim grid rides a broadcast onto the user-day contraction
    assert(p319.contains("BroadcastNestedLoopJoin"),
      s"the interim grid must broadcast:\n$p319")
    assert(!p319.contains("CartesianProduct"), p319)
  }

  test("q300 DSIR: bucket model broadcasts back onto the token stream; bounded head") {
    val plan = planOf(graft.ext.ExtQueries.q300DsirSelect(spark, Sf0001))
    // the 1024-row ratio model must ride a broadcast, never shuffle the
    // token stream by bucket
    assert(plan.contains("BroadcastHashJoin"),
      s"ratio model must broadcast-join the token stream:\n$plan")
    // exactly one bucket-id exchange: the model build's combined partials
    // (≤1024 rows per map task) — the probe-side token stream itself must
    // never shuffle on b, and totals must come from the bucket contraction,
    // not a second corpus scan
    assert("Exchange hashpartitioning\\(b[,#]".r.findAllIn(plan).size == 1,
      s"only the model build may exchange on bucket id:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-50 must run as the bounded heap:\n$plan")
  }

  test("q336 priority sample: bounded top-k heap directly over the scan, no full sort") {
    val plan = planOf(graft.ext.Sampling.prioritySample(
      Tables.documents(spark, Sf0001), 50, weight = col("n_chars")))
    assert(plan.contains("TakeOrderedAndProject"),
      s"weighted sample must be the k-heap, not a sort+limit:\n$plan")
    assert(!"(?m)^\\s*[*+:-]*\\(?\\d*\\)?\\s*Sort ".r.findFirstIn(plan).isDefined,
      s"full sort in the priority-sample plan:\n$plan")
  }

  test("q332 cdc chunking: one doc-keyed window shuffle, no cartesian anywhere") {
    val plan = planOf(Dedup.cdcChunks(Tables.documents(spark, Sf0001)))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"chunking must stay linear:\n$plan")
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size == 1,
      s"exactly ONE doc-keyed exchange feeds the boundary prefix sum:\n$plan")
  }

  test("q344 TWAP: single window pass, aggregate rides the window partitioning") {
    val plan = planOf(graft.queries.EventQueries.queries("q344_twap")(spark, Sf0001))
    assert("(?m)Window ".r.findAllIn(plan).size == 1, s"one lead window only:\n$plan")
    assert(!plan.contains("Join"), s"TWAP must not join:\n$plan")
    // the per-user aggregate must not re-shuffle what the window partitioned
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
      s"aggregate must reuse the window's user partitioning:\n$plan")
  }

  test("q340 KMV: exact-side self-join hashes on the fingerprint, pair stage is model-sized") {
    val plan = planOf(graft.ext.ExtQueries.queries("q340_kmv_overlap")(spark, Sf0001))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"exact-intersection join must be a hash/merge join on h:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"only the broadcast pair stage may be non-equi:\n$plan")
    // bottom-k sketches come from the bounded-state heap aggregate — a
    // row_number window would ship each source's full hash set to one task
    assert(plan.contains("ObjectHashAggregate"),
      s"sketch stage must be the heap aggregate:\n$plan")
    assert(!plan.contains("Window"),
      s"window sort crept back into the sketch stage:\n$plan")
  }

  test("q351 KM / q353 paths: ONE event scan each — no anchor-side recompute") {
    // the horizon/share anchors ride OVER () on bounded contractions; a
    // crossJoin'd 1-row aggregate would re-run the full scan pipeline
    for (q <- Seq("q351_kaplan_meier", "q353_top_paths")) {
      val plan = planOf(graft.queries.EventQueries.queries(q)(spark, Sf0001))
      assert("Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size == 1,
        s"$q must shuffle the event log on user exactly once:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"$q anchor must not be a crossJoin:\n$plan")
    }
    val paths = planOf(graft.queries.EventQueries.queries("q353_top_paths")(spark, Sf0001))
    assert(paths.contains("TakeOrderedAndProject"),
      s"top-10 must be the k-heap, not a full sort:\n$paths")
  }
}
