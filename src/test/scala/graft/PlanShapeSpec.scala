package graft

import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the properties that actually matter at 100 TB
  * — broadcasts where expected, pushdown reaching the scan, top-k not
  * becoming a global sort, codegen on the hot path.
  */
class PlanShapeSpec extends AnyFunSuite with SparkFixture {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan
  }

  /** Deep traversal that crosses AQE boundaries (QueryStageExec is a leaf
    * node whose real subtree hangs off .plan).
    */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: collectAll(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: collectAll(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: collectAll(r.child)
    case other => other +: (other.children.flatMap(collectAll) ++ other.subqueries.flatMap(collectAll))
  }

  test("star join broadcasts all three dimensions") {
    val plan = executed(operators.Joins.joinBroadcastDims(spark, sfDir))
    val bhj = collectAll(plan).count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj === 3, s"expected 3 BroadcastHashJoin, plan:\n$plan")
  }

  test("validity filter predicates are pushed to the parquet scan") {
    val df = operators.Relational.filterValidity(spark, sfDir)
    val scans = collectAll(df.queryExecution.sparkPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity"), pushed)
    assert(pushed.contains("l_shipdate"), pushed)
  }

  test("scan projection prunes to selected columns only") {
    val df = operators.Relational.projectRename(spark, sfDir)
    val scans = collectAll(df.queryExecution.sparkPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    val schema = scans.head.schema.fieldNames.toSet
    assert(schema === Set("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"),
      s"scan reads $schema")
  }

  test("global top-k compiles to TakeOrderedAndProject (no full sort)") {
    val plan = executed(operators.Sorts.topk(spark, sfDir))
    assert(collectAll(plan).exists(_.isInstanceOf[TakeOrderedAndProjectExec]), plan.toString)
  }

  test("flagship aggregate runs inside whole-stage codegen") {
    val plan = executed(operators.Aggregations.pricingSummary(spark, sfDir))
    assert(collectAll(plan).exists(_.isInstanceOf[WholeStageCodegenExec]), plan.toString)
  }

  test("theta join broadcasts the small side (nested loop, not cartesian shuffle)") {
    // static plan: at tiny scale AQE may collapse the whole query to an
    // EmptyRelation, so the executed plan can't be asserted on
    val plan = operators.Joins.joinThetaRange(spark, sfDir).queryExecution.sparkPlan
    assert(collectAll(plan).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]), plan.toString)
  }

  test("bloom runtime filter evaluates as a reused scalar subquery") {
    val df = operators.ExtraFuncs.bloomSemiJoin(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter_agg") || plan.contains("graft_bloom"), plan)
    assert(plan.contains("might_contain"), plan)
    assert(df.count() >= 0)
  }

  test("typed cogroup plans a CoGroup over both shuffled sides") {
    val df = operators.TypedOps.cogroupCustOrders(spark, sfDir)
    assert(df.queryExecution.optimizedPlan.toString.contains("CoGroup"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("as-of join shuffles exactly once (window formulation)") {
    val plan = executed(operators.Joins.joinAsof(spark, sfDir))
    // one exchange for the user_id window, one for the final global sort
    val exchanges = collectAll(plan).count(_.isInstanceOf[Exchange])
    assert(exchanges <= 2, s"as-of join should not shuffle more than window+sort:\n$plan")
  }

  test("sessionize runs both window passes on one user_id shuffle") {
    val plan = executed(operators.EventOps.sessionize(spark, sfDir))
    // lag + running-sum share the same (partitionBy, orderBy), so the
    // planner must reuse a single hashpartitioning(user_id) exchange;
    // the only other allowed exchange is the final presentation sort
    val exchanges = collectAll(plan).count(_.isInstanceOf[Exchange])
    assert(exchanges <= 2, s"sessionize should shuffle once + final sort:\n$plan")
  }

  test("co-purchase reads the derived pair relation; top-3 cut precedes its shuffle") {
    // r20: the basket explosion lives in the basket_pairs derived build;
    // the graded consumer must READ it (one FileScan over $tmp/graft_io)
    // and shuffle at most twice — the window's part exchange (fed by a
    // Partial WindowGroupLimit, so ≤3 rows per part cross it) and the
    // final presentation sort. A third exchange or a lineitem scan here
    // means the consumer silently re-derived the pair relation inline.
    val plan = executed(operators.ExtraFuncs.coPurchase(spark, sfDir))
    val scans = collectAll(plan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty && scans.forall(
      _.metadata("Location").contains("basket_pairs_")),
      s"co-purchase must read only the derived pair relation:\n$plan")
    val exchanges = collectAll(plan).count(_.isInstanceOf[Exchange])
    assert(exchanges <= 2, s"co-purchase should shuffle part+sort only:\n$plan")
    val txt = plan.toString
    assert(txt.contains("WindowGroupLimit"),
      s"top-3 cut should execute as WindowGroupLimit:\n$plan")
  }

  test("assoc-rules' min-support cut is pushed into the derived pair scan") {
    // the n_ab >= 3 filter must reach the basket_pairs parquet scan as a
    // PushedFilter — at scale the rare pairs are the bulk of the relation,
    // and a post-scan filter would read them all
    val df = operators.ExtraFuncs.assocRules(spark, sfDir)
    val pairScans = collectAll(df.queryExecution.sparkPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.metadata("Location").contains("basket_pairs_") => s
    }
    assert(pairScans.nonEmpty, df.queryExecution.sparkPlan.toString)
    val pushed = pairScans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(n_pair,3)"), pushed)
  }

  test("minhash signature aggregates via the native kernel, not 64 agg columns") {
    // signatures are materialized once per corpus (derived-file pattern);
    // the kernel assertion targets the materialization's own plan
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    val plan = operators.DedupOps.withShingleHashes(
        Tables.documents(spark, sfDir), "text")
      .select(col("doc_id"), explode(col("sh_hashes")).as("sh_hash"))
      .groupBy("doc_id")
      .agg(expr("graft_minhash_sig(sh_hash, 64)").as("sig"))
      .queryExecution.sparkPlan
    val objAggs = collectAll(plan).collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAggs.exists(_.aggregateExpressions.exists(
      _.aggregateFunction.isInstanceOf[graft.functions.MinHashSigAgg])), plan.toString.take(4000))
  }

  test("dq FK check broadcasts the dimension for the anti join") {
    val plan = executed(operators.QualityOps.dqChecks(spark, sfDir))
    val antiBhj = collectAll(plan).collect {
      case j: BroadcastHashJoinExec if j.joinType.sql == "LEFT ANTI" => j
    }
    assert(antiBhj.nonEmpty, plan.toString.take(4000))
  }

  test("vocabulary coverage joins the vocab back via broadcast") {
    val plan = executed(operators.TextOps.textVocabCoverage(spark, sfDir))
    assert(collectAll(plan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      plan.toString.take(4000))
  }

  test("scd2 history reuses one user_id shuffle for both window passes") {
    val plan = executed(operators.QualityOps.scd2History(spark, sfDir))
    // lag-collapse and lead-close share the (user_id) clustering: one
    // exchange for the windows + one for the final global sort
    val exchanges = collectAll(plan).count(_.isInstanceOf[Exchange])
    assert(exchanges <= 2, s"scd2 should not re-shuffle between windows:\n$plan")
  }

  test("chunking scan prunes to (doc_id, text) only") {
    val df = operators.TextOps.textChunk(spark, sfDir)
    val scans = collectAll(df.queryExecution.sparkPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    assert(scans.head.schema.fieldNames.toSet === Set("doc_id", "text"),
      scans.head.schema.fieldNames.mkString(","))
  }

  test("publish-json batches in a single aggregation shuffle") {
    val plan = executed(operators.SetOps.publishJson(spark, sfDir))
    // one exchange for the batch groupBy + one for the final sort
    val exchanges = collectAll(plan).count(_.isInstanceOf[Exchange])
    assert(exchanges <= 2, s"publish should be groupBy+sort only:\n$plan")
  }

  test("constant folding collapses literal arithmetic before execution") {
    import org.apache.spark.sql.functions._
    val df = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > lit(100) * lit(1000) + lit(500))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("100500"), optimized) // folded to one literal
    assert(!optimized.contains("* 1000"), optimized)
  }

  test("correlated EXISTS decorrelates into a join (no subquery at runtime)") {
    val df = operators.SqlSuite.queries("q_sql_correlated_exists")(spark, sfDir)
    val optimized = df.queryExecution.optimizedPlan
    val hasJoin = optimized.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.nonEmpty
    assert(hasJoin, optimized.toString)
    assert(!optimized.toString.contains("exists#"),
      "EXISTS predicate survived decorrelation:\n" + optimized)
  }

  test("dynamic partition pruning fires on a partitioned fact join") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim filter on a NON-join column read from parquet: the status="F"
    // restriction is opaque to constraint inference, so pruning the fact
    // partitions requires the runtime DPP subquery
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    import spark.implicits._
    Seq(("F", "keep"), ("O", "drop"), ("P", "drop"))
      .toDF("status", "flag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("flag") === "keep")
    val joined = fact.join(dim, Seq("status"))
      .agg(count(lit(1)).as("n"))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"), planStr.take(3000))
    assert(joined.collect()(0).getLong(0) > 0)
  }

  test("ANALYZE TABLE feeds exact row counts into the optimizer's statistics") {
    // rowCount propagates into logical-plan stats only under CBO
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS graft_stats_t")
      // a previously-failed run can leave the warehouse dir without the
      // metastore entry; clear it so saveAsTable doesn't trip on it
      def rmr(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmr)
        f.delete(): Unit
      }
      rmr(new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        "graft_stats_t"))
      Tables.nation(spark, sfDir).write.mode("overwrite").saveAsTable("graft_stats_t")
      spark.sql("ANALYZE TABLE graft_stats_t COMPUTE STATISTICS")
      val expected = Tables.nation(spark, sfDir).count()
      val stats = spark.table("graft_stats_t").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(expected)),
        s"optimizer stats rowCount=${stats.rowCount}, expected $expected")
      spark.sql("DROP TABLE graft_stats_t")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("join strategy hints are honored (SHUFFLE_HASH and MERGE beat auto-broadcast)") {
    import org.apache.spark.sql.functions._
    val l = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    // without a hint these dims auto-broadcast; the hints must override
    val shj = executed(l.hint("SHUFFLE_HASH")
      .join(o, l("l_orderkey") === o("o_orderkey")).agg(count(lit(1))))
    assert(collectAll(shj).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.ShuffledHashJoinExec]),
      s"SHUFFLE_HASH hint ignored:\n$shj")
    val smj = executed(l.hint("MERGE")
      .join(o, l("l_orderkey") === o("o_orderkey")).agg(count(lit(1))))
    assert(collectAll(smj).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"MERGE hint ignored:\n$smj")
  }

  test("partitioned-scan query prunes fact partitions via runtime DPP subquery") {
    val df = operators.Scans.scanPartitioned(spark, sfDir)
    val planStr = executed(df).toString
    assert(planStr.contains("dynamicpruning"), planStr.take(3000))
    // the partitioned parquet scan must carry a partition filter on ship_year
    assert(planStr.contains("PartitionFilters") && planStr.contains("ship_year"),
      planStr.take(3000))
  }

  test("bucketed-scan query sort-merge-joins with zero shuffle on the key") {
    val df = operators.Scans.scanBucketed(spark, sfDir)
    val plan = executed(df)
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"expected a SortMergeJoin, plan:\n$plan")
    // the bucketed layout must carry the co-partitioning: no exchange may
    // hash on the join key anywhere (the only allowed exchange is the
    // final tiny groupBy(o_orderstatus) agg)
    val keyExchanges = all.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning.toString.contains("orderkey") => e
    }
    assert(keyExchanges.isEmpty, s"bucketed join still shuffles on the key:\n$plan")
  }

  test("Q6-shape SQL pushes every predicate into the lineitem scan") {
    val df = operators.SqlSuite2.revenueForecast(spark, sfDir)
    val scans = collectAll(df.queryExecution.sparkPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
    val pushed = scans.map(_.metadata("PushedFilters")).mkString(";")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("LessThan(l_quantity,24"), pushed)
    assert(pushed.contains("l_discount"), pushed)
  }

  test("Q5-shape SQL broadcasts all dimension joins") {
    val plan = executed(operators.SqlSuite2.localVolume(spark, sfDir))
    val bhj = collectAll(plan).count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj >= 3, s"expected supplier/nation/region broadcasts, got $bhj:\n$plan")
  }

  test("Q2-shape correlated scalar-MIN decorrelates to equi-joins (no nested loop)") {
    val plan = executed(operators.SqlSuite3.minPriceSupplier(spark, sfDir))
    val all = collectAll(plan)
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"correlated subquery fell back to a nested loop:\n$plan")
    assert(!plan.toString.contains("CartesianProduct"), plan.toString.take(3000))
  }

  test("LATERAL ORDER BY+LIMIT decorrelates to a window, not a per-row join") {
    val plan = executed(operators.SqlSuite3.lateralTopN(spark, sfDir))
    val all = collectAll(plan)
    assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"lateral fell back to a nested loop:\n$plan")
    assert(!plan.toString.contains("CartesianProduct"), plan.toString.take(3000))
    assert(all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]) ||
      all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]),
      s"expected a window rewrite of the correlated LIMIT:\n$plan")
  }

  test("Q16-shape NOT IN plans as an anti join, never a cartesian") {
    val plan = executed(operators.SqlSuite3.supplierCnt(spark, sfDir))
    val planStr = plan.toString
    assert(planStr.contains("LeftAnti"), s"NOT IN did not become an anti join:\n${planStr.take(3000)}")
    assert(!planStr.contains("CartesianProduct"), planStr.take(3000))
  }

  test("Q13-shape ON-clause filter keeps zero-order customers (left join not degraded)") {
    import org.apache.spark.sql.functions._
    val dist = operators.SqlSuite3.custDistribution(spark, sfDir)
    val total = dist.agg(sum("custdist")).collect()(0).getLong(0)
    val customers = Tables.customer(spark, sfDir).count()
    assert(total === customers,
      s"distribution covers $total customers of $customers — the ON-clause filter leaked into WHERE")
  }

  test("vocab top-500 is TakeOrderedAndProject, not a single-partition window") {
    val plan = executed(operators.TextOps.textVocabCoverage(spark, sfDir))
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"vocab selection should be a distributed top-k:\n$plan")
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"vocab selection reintroduced a window:\n$plan")
  }

  test("column profiling scans each source table exactly once") {
    val df = operators.StatsOps.profileColumns(spark, sfDir)
    val scans = collectAll(df.queryExecution.sparkPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // orders + lineitem + customer — profiling cost is #tables, not #columns
    assert(scans.length === 3, s"expected 3 table scans, got ${scans.length}")
  }

  test("global sample index plans no single-partition exchange") {
    val df = operators.PipelineOps.sampleIndex(spark, sfDir)
    val planStr = executed(df).toString
    assert(!planStr.contains("SinglePartition"),
      "contiguous-id assignment funnelled through one partition:\n" + planStr.take(3000))
  }

  test("token-budget prefix sum plans no single-partition exchange") {
    val df = operators.PipelineOps.tokenBudget(spark, sfDir)
    val planStr = executed(df).toString
    assert(!planStr.contains("SinglePartition"),
      "global running sum funnelled through one partition:\n" + planStr.take(3000))
  }

  test("partitioned ntile plans no single-partition exchange") {
    val df = operators.StatsOps.ntileBuckets(spark, sfDir)
    val planStr = executed(df).toString
    assert(!planStr.contains("SinglePartition"),
      "global-window ntile reintroduced a single-partition stage:\n" + planStr.take(3000))
  }

  test("single-melt RFM plans no single-partition exchange") {
    // the r10 reshape ranks all three metrics in ONE kernel pass over the
    // melted (custkey, metric, v) relation — make sure neither the melt nor
    // the pivot-back reintroduced a global single-partition stage
    val df = operators.ExtraFuncs.rfmSegments(spark, sfDir)
    val planStr = executed(df).toString
    assert(!planStr.contains("SinglePartition"),
      "single-melt RFM funnelled through one partition:\n" + planStr.take(3000))
  }

  test("SCD2 effective-dated join plans as an equi join, not a nested loop") {
    val plan = executed(operators.QualityOps.scd2Join(spark, sfDir))
    val str = plan.toString
    assert(!str.contains("BroadcastNestedLoopJoin") && !str.contains("CartesianProduct"),
      "the range condition must ride the user_id equi join as a post-filter:\n" +
        str.take(3000))
  }

  test("delete cascade prunes both fact tables via broadcast joins (no fact shuffle)") {
    val plan = executed(operators.QualityOps.deleteCascade(spark, sfDir))
    val joins = collectAll(plan).filter(_.nodeName.toLowerCase.contains("join"))
    assert(joins.nonEmpty)
    val nonBroadcast = joins.filterNot(j =>
      j.nodeName.contains("BroadcastHashJoin") || j.nodeName.contains("BroadcastNestedLoop"))
    assert(nonBroadcast.isEmpty,
      s"cascade joins must broadcast the tombstones: ${joins.map(_.nodeName)}")
  }

  test("MERGE compiles to exactly one join") {
    val plan = executed(operators.SetOps.mergeFull(spark, sfDir))
    val joins = collectAll(plan).filter(_.nodeName.toLowerCase.contains("join"))
    assert(joins.length === 1,
      s"all four MERGE arms must share one full-outer join: ${joins.map(_.nodeName)}")
  }

  test("two-phase global rank really runs on >1 partition at runtime") {
    import org.apache.spark.sql.functions._
    // the static no-SinglePartition assertions above can't see AQE's
    // runtime coalescing: a bare repartitionByRange(cols) over a small
    // input folds to ONE partition after the fact. The kernel pins the
    // exchange with an explicit count — verify the materialized pid
    // histogram is actually multi-partition.
    val (ranked, n) = operators.StatsOps.globalRanked(spark,
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice")),
      Seq(col("o_totalprice"), col("o_orderkey")), s"$sfDir#orders:totalprice")
    val nPids = ranked.select("pid").distinct().count()
    assert(nPids > 1, s"rank kernel collapsed to $nPids partition(s) at runtime")
    assert(ranked.agg(min("r"), max("r")).head() ===
      org.apache.spark.sql.Row(1L, n), "global rank must be contiguous 1..N")
  }

  test("rank-kernel memo: same key reuses the build, collision guard trips") {
    import org.apache.spark.sql.functions._
    // two calls with the same (session, key) must return the SAME
    // checkpointed relation (no second build), and a key reused with a
    // DIFFERENT total order must fail loudly instead of silently serving
    // the wrong ranking
    val rel1 = operators.StatsOps.rankedRel(spark,
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice")),
      Seq(col("o_totalprice"), col("o_orderkey")), s"$sfDir#orders:totalprice")
    val rel2 = operators.StatsOps.rankedRel(spark,
      Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice")),
      Seq(col("o_totalprice"), col("o_orderkey")), s"$sfDir#orders:totalprice")
    assert(rel1 eq rel2, "same key must return the memoized instance")
    val ex = intercept[IllegalArgumentException] {
      operators.StatsOps.rankedRel(spark,
        Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice")),
        Seq(col("o_orderkey")), s"$sfDir#orders:totalprice")
    }
    assert(ex.getMessage.contains("different sort order"))
  }

  test("AQE splits a skewed join partition (OptimizeSkewedJoin fires)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one hot key carrying ~100k rows vs 100 singleton keys — the shape
    // salting handles manually (q_agg_salted); here the runtime re-plan
    // handles it: AQE detects the oversized shuffle partition and splits
    // it across tasks (SMJ prints skew=true). Thresholds are lowered so
    // the fixture-sized data trips the same code path as a hot key at
    // 100 TB; broadcast is disabled to keep the join a shuffle join.
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 16 partitions so the hot key's partition dwarfs the median; the
      // payload must survive column pruning (it feeds the aggregate) so
      // the skewed partition is big in BYTES, which is what AQE measures
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      val fact = spark.range(0, 100000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), rpad(col("id").cast("string"), 32, "x")).as("payload"))
      val dim = spark.range(0, 100000, 10).select(col("id").as("k"), lit("d").as("tag"))
      val joined = fact.join(dim, Seq("k")).agg(sum(length(col("payload"))))
      assert(joined.collect()(0).getLong(0) === 100000L * 40)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"), planStr.take(3000))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("BM25 top-50 is TakeOrderedAndProject and the term stats are broadcast") {
    val plan = executed(operators.SearchOps.textBm25(spark, sfDir))
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"expected TakeOrderedAndProject, plan:\n$plan")
    // df (query-vocab-sized) and the 1-row corpus stats must both be broadcast
    assert(all.exists(_.isInstanceOf[BroadcastHashJoinExec]), s"plan:\n$plan")
    assert(all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]), s"plan:\n$plan")
  }

  test("k-means assignment broadcasts centroids and never explodes the vectors") {
    import org.apache.spark.sql.functions.col
    val vecs = operators.ClusterOps.quantized(spark, sfDir)
    val seed = vecs.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("q").as("c"))
    val assigned = operators.ClusterOps.assign(vecs, seed)
    val all = collectAll(executed(assigned))
    // centroids arrive via a broadcast (BNLJ cross of a K-row side)
    assert(all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "centroids were not broadcast")
    // the distance is zip_with/aggregate over the arrays — no Generate
    // (explode) may appear anywhere on the assignment path
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]),
      "assignment path exploded the vectors")
    // top-1-per-vector is pushed down as a WindowGroupLimit before the shuffle
    assert(all.map(_.getClass.getSimpleName).count(_ == "WindowGroupLimitExec") >= 2,
      "expected partial+final WindowGroupLimit for the rn=1 filter")
  }

  test("rolling active users plans as hash joins — the explode avoided the range join") {
    for (df <- Seq(operators.EventOps.rollingActive(spark, sfDir),
                   operators.EventOps.rollingActiveHll(spark, sfDir))) {
      val all = collectAll(executed(df))
      // a naive day-range formulation degenerates to BroadcastNestedLoopJoin;
      // the 7× explode must keep everything equi-keyed
      assert(!all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "rolling window fell back to a nested-loop range join")
      assert(all.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "observed-days clip is not a broadcast hash semi-join")
    }
  }

  test("EWMA runs all 8 lags in ONE window pass over one shuffle") {
    val all = collectAll(executed(operators.TimeWindows.tsEwma(spark, sfDir)))
    val windows = all.count(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
    assert(windows === 1, s"expected a single WindowExec for the 8 lags, got $windows")
  }

  test("interval coverage shares one hash shuffle across both window passes") {
    val all = collectAll(executed(operators.TimeWindows.tsCoverage(spark, sfDir)))
    val hashShuffles = all.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    // one user_id shuffle feeds cummax + island-sum + the island aggregate;
    // the only other hash exchange is the final per-user aggregate
    assert(hashShuffles.size <= 2,
      s"expected <= 2 hash shuffles (windows must share partitioning), got ${hashShuffles.size}")
  }

  test("hard-negative mining and kNN audit broadcast the probe/anchor side") {
    for (df <- Seq(operators.SimilarityOps.hardNegatives(spark, sfDir),
                   operators.SimilarityOps.knnLabelNoise(spark, sfDir))) {
      val all = collectAll(executed(df))
      // the corpus must stream through a broadcast join against the small
      // probe/anchor side (theta predicate → BroadcastNestedLoopJoin);
      // a SortMergeJoin here would shuffle the whole corpus per audit
      assert(all.exists(p => p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
          p.isInstanceOf[BroadcastHashJoinExec]),
        "probe/anchor side was not broadcast")
      assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
        "corpus was shuffle-joined against the tiny probe side")
    }
  }

  test("PQ-ADC scores codes against a BROADCAST probe-centroid table") {
    val plan = executed(operators.ClusterOps.embedPqAdc(spark, sfDir))
    // the pdist lookup must broadcast — a shuffle join keyed by (m, cid)
    // would move the whole code relation for a 160-row table
    assert(collectAll(plan).exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"pdist join should be BroadcastHashJoin:\n$plan")
  }

  test("association rules broadcast the 1-row transaction total") {
    val plan = executed(operators.ExtraFuncs.assocRules(spark, sfDir))
    val bnlj = collectAll(plan).count(_.isInstanceOf[BroadcastNestedLoopJoinExec])
    assert(bnlj >= 1, s"n_tx crossJoin should be a broadcast nested loop:\n$plan")
    assert(plan.toString.contains("TakeOrderedAndProject") ||
      collectAll(plan).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"top-10 by lift should not global-sort:\n$plan")
  }

  test("peak concurrency windows stay partitioned by event type (no SinglePartition)") {
    val plan = executed(operators.EventOps.peakConcurrency(spark, sfDir))
    val windows = collectAll(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"every window must partition by event_type:\n$plan")
  }

  test("CDC apply runs exactly one keyed window and no cartesian anywhere") {
    val plan = executed(operators.QualityOps.cdcApply(spark, sfDir))
    val all = collectAll(plan)
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the rn=1 filter should compile to WindowGroupLimit (top-1 per key),
    // and whatever form it takes it must be partitioned by the key
    assert(windows.nonEmpty, s"no window in CDC plan:\n$plan")
    windows.foreach {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        assert(w.partitionSpec.nonEmpty, s"unpartitioned CDC window:\n$plan")
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        assert(w.partitionSpec.nonEmpty, s"unpartitioned CDC group limit:\n$plan")
      case _ => ()
    }
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]))
  }

  test("anon ladder classifies via broadcast joins over the bucket relation") {
    val plan = executed(operators.QualityOps.anonLadder(spark, sfDir))
    val all = collectAll(plan)
    val bhj = all.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(bhj === 2, s"expected both rung joins broadcast:\n$plan")
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"no sort-merge join should appear on the tiny bucket relations:\n$plan")
  }

  test("winnowing window is partitioned by doc (never a global sort)") {
    val plan = executed(operators.CorpusOps.winnowFingerprint(spark, sfDir))
    val windows = collectAll(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"winnowing frame-min must partition by doc_id:\n$plan")
  }

  test("feature-AUC, rank-fusion, and changepoint windows all stay partitioned") {
    Seq(
      operators.EvalOps.evalFeatureAuc(spark, sfDir),
      operators.SearchOps.rankFusion(spark, sfDir),
      operators.TimeWindows.tsChangepoint(spark, sfDir)
    ).foreach { df =>
      val windows = collectAll(executed(df)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"unpartitioned window in:\n${df.queryExecution.executedPlan}")
    }
  }

  test("cohort LTV broadcasts the cohort sizes and windows per cohort") {
    val plan = executed(operators.ExtraFuncs.cohortLtv(spark, sfDir))
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"cohort sizes must broadcast:\n$plan")
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"LTV cumulative window must partition by cohort:\n$plan")
  }

  test("JSD broadcasts the lang totals on every enrichment join") {
    val plan = executed(operators.CorpusOps.textJsd(spark, sfDir))
    val all = collectAll(plan)
    // nl (5 rows) and nTot (1 row) enter via broadcast; the only
    // non-broadcast join permitted is the vocab-bounded word correction
    val smj = all.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(smj.size <= 2,
      s"only the word join (+ final lang assembly) may shuffle:\n$plan")
    assert(all.count(_.isInstanceOf[BroadcastHashJoinExec]) +
      all.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 3,
      s"lang/total enrichments must broadcast:\n$plan")
  }

  test("price elasticity broadcasts the part dim and blocking prunes to two columns") {
    val plan = executed(operators.InferenceOps.priceElasticity(spark, sfDir))
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"part dim must broadcast into the lineitem scan side:\n$plan")
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"no sort-merge join on a broadcast-able dim:\n$plan")
    // blocking planner: the part scan must read only p_name + p_brand
    val scan = executed(operators.DedupOps.linkBlocking(spark, sfDir))
      .toString
    assert(scan.contains("ReadSchema") &&
      scan.contains("p_name") && scan.contains("p_brand") &&
      !scan.contains("p_retailprice"),
      s"blocking scan must prune to the two blocking columns:\n$scan")
  }

  test("CUPED/DiD aggregate shapes: no join or window touches row cardinality") {
    Seq(
      operators.InferenceOps.cuped(spark, sfDir),
      operators.InferenceOps.didEstimator(spark, sfDir)
    ).foreach { df =>
      val all = collectAll(executed(df))
      assert(!all.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.window.WindowExec]),
        "moment pipelines must not window")
      // every join present must be broadcast (1-row moment / 2-row arm sides)
      assert(!all.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
        s"tiny recombinations must broadcast:\n${df.queryExecution.executedPlan}")
    }
  }

  test("drawdown's only unpartitioned window runs over the daily aggregate") {
    val plan = executed(operators.TimeWindows.tsDrawdown(spark, sfDir))
    val all = collectAll(plan)
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size === 1)
    // the window input must already be the grouped daily relation: a
    // HashAggregate appears BELOW the window in the plan tree
    def below(p: SparkPlan): Seq[SparkPlan] = collectAll(p)
    assert(windows.forall(w => below(w).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec])),
      s"running max must consume the calendar-bounded daily aggregate:\n$plan")
  }

  test("every r11m time-series window partitions by event type") {
    // the whole technical/drift family must never hit SinglePartition
    // on a row-cardinality relation
    Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      ("rsi", operators.TimeWindows.winRsi),
      ("atr", operators.TimeWindows.tsAtr),
      ("bollinger", operators.TimeWindows.winBollinger),
      ("obv", operators.TimeWindows.winObv),
      ("page_hinkley", operators.TimeWindows.tsPageHinkley),
      ("pacf", operators.TimeWindows.tsPacf),
      ("adf", operators.TimeWindows.tsAdf),
      ("hurst", operators.TimeWindows.tsHurst),
      ("dw", operators.InferenceOps.durbinWatson),
      ("fulfillment", operators.TimeWindows.tsFulfillment)
    ).foreach { case (name, fn) =>
      val plan = executed(fn(spark, sfDir))
      val windows = collectAll(plan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty, s"$name must use windows")
      assert(windows.forall(_.partitionSpec.nonEmpty),
        s"$name window must stay key-partitioned:\n$plan")
    }
  }

  test("HITS broadcasts the order map and both score relations") {
    val plan = executed(operators.GraphOps.hits(spark, sfDir))
    val all = collectAll(plan)
    // checkpointed rounds truncate the visible plan; the final plan
    // (scan of the checkpoint) must contain no shuffled join at all,
    // and the full operator ran via broadcast joins (asserted by the
    // per-round structure below on a rebuilt unmaterialized prefix)
    val smj = all.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(smj.isEmpty, s"hits output must be checkpoint-backed:\n$plan")
  }

  test("naive bayes scores via broadcasts and the argmax is a windowless aggregate") {
    val plan = executed(operators.TextOps.mlNaiveBayes(spark, sfDir))
    val all = collectAll(plan)
    assert(all.count(_.isInstanceOf[BroadcastHashJoinExec]) +
      all.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 3,
      s"lexicon, lang totals, vocab size and priors must broadcast:\n$plan")
    // r21: the per-doc argmax is min(struct(-score, plang)) — a plain
    // map-side-combinable aggregate. A window (even the
    // WindowGroupLimit rewrite) would re-introduce a per-partition
    // sort this plan no longer needs; its reappearance means the
    // argmax regressed to row_number
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case g: org.apache.spark.sql.execution.window.WindowGroupLimitExec => g
    }
    assert(windows.isEmpty,
      s"the argmax must stay a windowless struct-min aggregate:\n$plan")
  }

  test("triplet mining broadcasts the anchor slice and windows per anchor") {
    val plan = executed(operators.ClusterOps.embedTriplets(spark, sfDir))
    val all = collectAll(plan)
    assert(all.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) ||
      all.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"anchors must broadcast against the corpus:\n$plan")
    val windows = all.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"the nearest-positive window must partition by anchor:\n$plan")
  }

  test("the int64 vector kernels stay in the hot pair plans (no HOF fallback)") {
    // r19: the pair loops must run the codegen graft_sql2/graft_ldot/
    // graft_eqcount kernels — a silent revert to zip_with/aggregate
    // (CodegenFallback: interpreted lambdas + an allocation per pair)
    // costs 2-4x on the embed family and would not fail correctness
    Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, String)](
      ("hubness", operators.ClusterOps.embedHubness, "graft_sql2"),
      ("triplets", operators.ClusterOps.embedTriplets, "graft_sql2"),
      ("silhouette", operators.ClusterOps.embedSilhouette, "graft_sql2"),
      ("intrinsic_dim", operators.SeriesOps.embedIntrinsicDim, "graft_ldot"),
      // isotropy's norm is SINGLE-USE, so CollapseProject inlines it into
      // the per-element division lambda — with an interpreted fold that
      // re-evaluates 64 lambda calls per element (measured 7x the query)
      ("isotropy", operators.SeriesOps.embedIsotropy, "graft_dot"),
      ("sketch_calibration", operators.DedupOps.sketchCalibration,
        "graft_eqcount"),
      ("embed_cosine", (s: org.apache.spark.sql.SparkSession, d: String) =>
        operators.DedupOps.dedupEmbedCosine(s, d), "graft_maxabsdiff")
    ).foreach { case (name, fn, kernel) =>
      val plan = executed(fn(spark, sfDir)).toString
      assert(plan.contains(kernel),
        s"$name: the $kernel kernel left the plan")
      assert(!plan.contains("zip_with"),
        s"$name: an interpreted zip_with fold re-entered the hot path")
    }
  }

  test("the final r11m wave keeps windows keyed and dims broadcast") {
    // stochastic/RSI-family sibling + the corpus-scaling pair + the
    // month/club rollups: no SinglePartition window over row
    // cardinality, and the seasonal/rich-club totals enter broadcast
    Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      ("stochastic", operators.TimeWindows.winStochastic),
      ("heaps", operators.TextOps.textHeaps)
    ).foreach { case (name, fn) =>
      val plan = executed(fn(spark, sfDir))
      val windows = collectAll(plan).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
        s"$name windows must stay key-partitioned:\n$plan")
    }
    val si = executed(operators.TimeWindows.tsSeasonalIndex(spark, sfDir))
    assert(collectAll(si).exists(
      _.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"the seasonal total must broadcast:\n$si")
    val rc = executed(operators.GraphOps.richClub(spark, sfDir))
    assert(collectAll(rc).count(p =>
      p.isInstanceOf[BroadcastHashJoinExec] ||
        p.isInstanceOf[BroadcastNestedLoopJoinExec]) >= 2,
      s"rich-club degrees must broadcast onto both endpoints:\n$rc")
  }

  test("textrank's bigram window partitions by doc (never a global sort)") {
    val plan = executed(operators.TextOps.textTextrank(spark, sfDir))
    val windows = collectAll(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // final plan is checkpoint-backed (rounds truncate); any window
    // remaining in the visible plan must still be keyed
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"textrank windows must stay doc-partitioned:\n$plan")
  }

  test("r13 top-20 language-model rankings are TakeOrderedAndProject") {
    for (df <- Seq(operators.TuningOps.textKneserNey(spark, sfDir),
      operators.TuningOps.textCollocationLlr(spark, sfDir))) {
      val plan = executed(df)
      assert(collectAll(plan).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
        s"top-20 must be a bounded heap, not a global sort:\n$plan")
    }
  }

  test("r13 BLEU clip kernel joins without cartesian products") {
    val plan = executed(operators.TextEvalOps.evalBleu(spark, sfDir))
    val str = plan.toString
    assert(!str.contains("CartesianProduct"), str.take(3000))
  }

  test("r13 nearest as-of join: keyed windows only, no pair join") {
    val plan = executed(operators.Joins.joinAsofNearest(spark, sfDir))
    val windows = collectAll(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"both directional windows must stay user-partitioned:\n$plan")
    val str = plan.toString
    assert(!str.contains("CartesianProduct") &&
      !str.contains("BroadcastNestedLoopJoin"),
      "nearest as-of must never build candidate pairs:\n" + str.take(3000))
  }

  test("r13 zone-map clustered layout avoids the single-partition window") {
    val plan = executed(operators.TrainSplitOps.zonemapPrune(spark, sfDir))
    val windows = collectAll(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the date-clustered file assignment rides the two-phase rank kernel
    // (range repartition + pid-keyed window) — an unkeyed window here
    // would mean the kernel was bypassed
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"zonemap windows must stay pid-partitioned:\n$plan")
  }

  test("r13 Shapley: the corpus-sized job is one aggregate; algebra broadcasts") {
    val plan = executed(operators.ImpactOps.eventShapley(spark, sfDir))
    val str = plan.toString
    assert(!str.contains("CartesianProduct") ||
      !str.contains("SortMergeJoin"),
      "coalition algebra must broadcast, not shuffle:\n" + str.take(3000))
    assert(collectAll(plan).exists(p =>
      p.isInstanceOf[BroadcastHashJoinExec] ||
        p.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"expected broadcast joins on the coalition relation:\n$plan")
  }

  test("r13 pass@k is one user aggregate: no join, no window, no explode") {
    val plan = executed(operators.TextEvalOps.evalPassAtK(spark, sfDir))
    val all = collectAll(plan)
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BaseJoinExec]),
      s"pass@k must not join:\n$plan")
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.window.WindowExec]),
      s"pass@k must not window:\n$plan")
    assert(!all.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.GenerateExec]),
      s"the k-expansion must be row-local arithmetic, not explode:\n$plan")
  }

  test("r13 intrinsic dim: label-blocked equi-join, never a cartesian pass") {
    val plan = executed(operators.SeriesOps.embedIntrinsicDim(spark, sfDir))
    assert(!collectAll(plan).exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.CartesianProductExec]),
      s"pair generation must stay label-blocked:\n$plan")
  }

  test("r13 rolling indicators keep their windows priority-partitioned") {
    Seq(
      operators.IndicatorOps.winDonchian(spark, sfDir),
      operators.IndicatorOps.winAroon(spark, sfDir),
      operators.IndicatorOps.winCci(spark, sfDir),
      operators.IndicatorOps.winVwap(spark, sfDir)).foreach { df =>
      val windows = collectAll(executed(df)).collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      assert(windows.forall(_.partitionSpec.nonEmpty),
        "indicator windows must stay key-partitioned")
    }
  }

  test("r13 prune curve rides the rank kernel: windows stay partitioned") {
    val plan = executed(operators.DecisionOps.pruneCurve(spark, sfDir))
    val windows = collectAll(plan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // corpus-sized ranking must ride the pid-keyed kernel; only the
    // 10-row decile cumulative may run unpartitioned
    val unkeyed = windows.filter(_.partitionSpec.isEmpty)
    assert(unkeyed.size <= 1,
      s"at most the bounded 10-row cumulative may be unpartitioned:\n$plan")
  }

  test("r13 binned theta join: hash equi-join, no nested-loop band scan") {
    val df = operators.Joins.joinThetaBinned(spark, sfDir)
    val plan = executed(df)
    assert(!collectAll(plan).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"the binned formulation must never nested-loop:\n$plan")
    assert(!plan.toString.contains("CartesianProduct"))
    // and it must reproduce the range join EXACTLY
    val binned = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val ranged = operators.Joins.joinThetaRange(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned.sameElements(ranged), "binned != range join output")
  }

  test("r13 SQL top-3-per-nation plans as WindowGroupLimit, not a global sort") {
    val plan = executed(operators.SqlSuite4.top3PerNation(spark, sfDir))
    assert(plan.toString.contains("WindowGroupLimit"),
      s"rank<=3 filter should push into the window:\n$plan")
  }

  test("r13 incremental dedup: the cut is broadcast, one key aggregate") {
    val plan = executed(operators.CurationOps.dedupIncremental(spark, sfDir))
    assert(collectAll(plan).exists(p =>
      p.isInstanceOf[BroadcastNestedLoopJoinExec] ||
        p.isInstanceOf[BroadcastHashJoinExec]),
      s"the 1-row cut must broadcast over the corpus:\n$plan")
    assert(!plan.toString.contains("CartesianProduct"),
      s"no cartesian pass:\n$plan")
  }
}
