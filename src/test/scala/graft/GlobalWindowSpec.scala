package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LocalLimit, LogicalPlan, Window => LWindow}
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
    "q_split_rolling_origin", "q_stats_ansari_bradley", "q_stats_cvm",
    "q_stats_hill", "q_stats_kruskal", "q_stats_mood", "q_stats_quade",
    "q_stats_spearman",
    "q_survival", "q_text_zipf", "q_ts_backlog", "q_ts_engle_granger",
    "q_ts_gapfill", "q_ts_granger", "q_ts_kpss", "q_ts_ljung_box",
    "q_ts_periodogram", "q_ts_seasonal", "q_ts_spectral_entropy",
    "q_ts_stl_strength", "q_ts_variance_ratio", "q_win_drawdown")

  private def boundedBelow(w: LWindow): Boolean =
    w.child.collectFirst {
      case _: GlobalLimit => ()
      case _: LocalLimit => ()
      case _: Aggregate => ()
    }.nonEmpty

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
