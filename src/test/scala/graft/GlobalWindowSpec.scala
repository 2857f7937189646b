package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Project, Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Closes the "single-partition WindowExec warning" class: a window
  * with NO partition spec moves its whole input to one task, which is
  * only acceptable when that input is provably bounded — a limit or a
  * group-cardinality-bounded aggregate below it. This spec sweeps the
  * optimized logical plan of EVERY graded query, asserts each
  * no-partition Window has such a bounding node in its child subtree,
  * and pins the exact set of queries that carry one — a new operator
  * that sneaks in an unbounded (or merely unreviewed) global window
  * fails here until it is consciously whitelisted.
  */
class GlobalWindowSpec extends AnyFunSuite with SparkFixture {

  /** Queries REVIEWED as safe global-window carriers: in each, every
    * no-partition window sits over a bounded relation (the assertion
    * below verifies the structural bound; this list pins membership).
    */
  private val reviewed: Set[String] = Set(
    "q_ab_sequential", "q_benford", "q_bpe_train_step", "q_eval_auc",
    "q_eval_bootstrap_auc",
    "q_eval_cost_curve", "q_eval_ks_score", "q_eval_lift", "q_eval_pr_auc",
    "q_eval_pr_curve", "q_eval_youden", "q_event_hazard", "q_graph_ppr",
    "q_hhi", "q_lorenz_deciles", "q_mix_resample", "q_mix_temperature",
    "q_mix_weights", "q_ml_stump", "q_prune_curve", "q_quality_filter_sweep",
    "q_sample_apportion", "q_sample_neyman", "q_skew_report", "q_skyline",
    "q_split_rolling_origin",
    // r16: AD two-sample — same (event_type, day) bounded carrier as cvm
    "q_stats_ad_2sample",
    "q_stats_ansari_bradley", "q_stats_cvm",
    // r16: HL shift estimator — order-statistic pick over the bounded
    // calendar² cross product of the two day aggregates
    "q_stats_hodges_lehmann",
    "q_stats_hill", "q_stats_kruskal", "q_stats_mood", "q_stats_quade",
    "q_stats_spearman",
    "q_survival", "q_text_zipf", "q_ts_backlog", "q_ts_engle_granger",
    // r16: cumulative periodogram — cum/extrema windows above the
    // materialized-spectrum read, bounded by the value-neutral
    // SpectrumBound limit (r17: the spectrum moved to the derived tier,
    // so the bound is declared by a Limit instead of the day aggregate)
    "q_ts_cum_periodogram",
    // r17: Cox–Stuart — row_number above the calendar-bounded day
    // aggregate; the pairing join is ~N/2 rows
    "q_ts_cox_stuart",
    // r17 nonparametric batch: each carries ranks/cumulative windows
    // above a calendar- or weekday-bounded aggregate ((event_type, day),
    // day, or dow — all bounded domains)
    "q_stats_wilcoxon_signed", "q_stats_pettitt", "q_stats_kuiper",
    "q_stats_breusch_pagan",
    // r17: RBO — position row_numbers above LIMIT 50 relations
    "q_eval_rbo",
    // r17: log-rank — the #222 reverse-cumulative risk-set windows over
    // the duration aggregate; Haar — row_number/cum over the day aggregate
    "q_stats_logrank", "q_ts_haar_energy",
    // r17: median CI ranks / AR(1) lag / Chow's index+segment windows —
    // all above the day aggregate
    "q_stats_median_ci", "q_ts_halflife", "q_ts_chow",
    // r18: ARCH LM — two lag windows above the day aggregate (the
    // q_ts_halflife carrier, calendar-bounded). CUSUMSQ carries the
    // same calendar-bounded windows but hides them behind a
    // localCheckpoint, so it never registers as a carrier here —
    // its boundedness is reviewed at the operator (NonparamOps
    // .tsCusumSq scaladoc) instead.
    "q_ts_arch_lm",
    // r17: Zipf GOF — rank/cum windows above the LIMIT 100 relation
    "q_text_zipf_gof",
    "q_ts_gapfill", "q_ts_granger", "q_ts_kpss", "q_ts_ljung_box",
    "q_ts_periodogram", "q_ts_seasonal", "q_ts_spectral_entropy",
    "q_ts_stl_strength", "q_ts_variance_ratio", "q_win_drawdown")

  /** Attribute names an in-subtree Aggregate may group by and still
    * count as a BOUND (r15, tightening the r14 ADVICE's "any Aggregate
    * anywhere" hole): each is a reviewed bounded domain — event/flag
    * alphabets, languages, priorities, calendar units, fixed bucket or
    * threshold grids — so the aggregate's output cardinality is
    * data-scale-free. An aggregate grouping by a row-grain key
    * (user_id, doc_id, okey…) no longer qualifies: a no-partition
    * window above it fails this spec until the plan is fixed.
    */
  private val boundedGroupCols: Set[String] = Set(
    // event alphabet + calendar units (events fixture)
    "event_type", "day", "wk", "week", "mo", "month", "yr", "year", "d",
    // documents: language / source / fixed mixture grids
    "lang", "source", "w_ppm", "temp_milli",
    // orders/lineitem: priority, flags, status
    "pri", "o_orderpriority", "l_returnflag", "o_orderstatus", "flag",
    // fixed evaluation/threshold/bucket grids
    "bucket", "decile", "thr_ppm", "tau_ppm", "cut_ppm", "k", "grp",
    "metric", "side", "cls", "digit", "lag", "split", "b", "seg",
    // value-resolution grids: distinct values of a quantized integer
    // measurement (the ROC/PR score axis), bounded by the value range,
    // not the row count; n_name is the 25-value nation dimension
    "n_chars", "n_name")

  /** Calendar-unit extractors: their RANGE is bounded whatever column
    * they read, so a grouping expression built from them is a bounded
    * domain even when its leaf reference (ts, o_orderdate) is row-grain.
    */
  private def calendarFn(e: Expression): Boolean = e match {
    case _: TruncTimestamp | _: TruncDate | _: Year | _: Month |
         _: DayOfMonth | _: DayOfWeek | _: WeekDay | _: WeekOfYear |
         _: Quarter | _: Hour | _: Minute => true
    case _ => false
  }

  /** Resolve an attribute to the expression that defines it in a
    * Project/Aggregate below (the optimizer extracts computed grouping
    * keys into `_groupingexpression` aliases).
    */
  private def defining(a: Attribute, below: LogicalPlan): Option[Expression] = {
    val aliases = below.collect {
      case p: Project => p.projectList
      case ag: Aggregate => ag.aggregateExpressions
    }.flatten.collect { case al: Alias if al.exprId == a.exprId => al.child }
    aliases.headOption
  }

  /** An attribute produced by a Generate (explode of a sequence) whose
    * bounds are themselves bounded — a replica/slot index grid.
    */
  private def fromBoundedGenerate(a: Attribute, below: LogicalPlan): Boolean =
    below.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
          if g.generatorOutput.exists(_.exprId == a.exprId) =>
        g.generator.children.forall(boundedExpr(_, g.child))
    }.exists(identity)

  private def boundedExpr(e: Expression, below: LogicalPlan): Boolean = e match {
    case a: Attribute =>
      boundedGroupCols.contains(a.name) ||
        defining(a, below).exists(boundedExpr(_, below)) ||
        fromBoundedGenerate(a, below)
    case _: Literal => true
    case e if calendarFn(e) => true
    // a grouping key that IS a lower aggregate's output (count/sum per
    // entity) makes the node a VALUE HISTOGRAM: its cardinality is the
    // number of distinct aggregate values — bounded by the value range,
    // never by the entity count (the Spearman tie-histogram shape)
    case _: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression => true
    case other =>
      other.children.nonEmpty && other.children.forall(boundedExpr(_, below))
  }

  private def boundedBelow(w: LWindow): Boolean =
    w.child.collect {
      case _: GlobalLimit => true
      case _: LocalLimit => true
      case a: Aggregate =>
        a.groupingExpressions.forall(boundedExpr(_, a.child))
    }.exists(identity)

  test("every no-partition window sits over a limit or aggregate; set is pinned") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    val carriers = scala.collection.mutable.SortedSet[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan: LogicalPlan =
        try fn(spark, sfDir).queryExecution.optimizedPlan
        catch { case e: Throwable =>
          fail(s"$name failed to plan: ${e.getMessage}")
        }
      val globals = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      if (globals.nonEmpty) {
        carriers += name
        globals.foreach { w =>
          if (!boundedBelow(w))
            offenders += s"$name: unbounded global window over\n${w.child.treeString}"
        }
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n\n"))
    assert(carriers.toSet === reviewed,
      s"global-window carrier set drifted.\n  carriers: ${carriers.mkString(", ")}\n" +
        s"  reviewed: ${reviewed.toSeq.sorted.mkString(", ")}")
  }
}
