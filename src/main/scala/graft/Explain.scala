package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit utility: prints explain("formatted") for the named queries
  * (or a default set of scale-critical ones) so shuffle counts, pushed
  * filters, scan schemas and broadcast choices can be reviewed at any SF.
  * Usage: runMain graft.Explain <sfDir> [queryKey ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q_agg_pricing_summary", "q_join_broadcast_dims", "q_join_asof",
      "q_dedup_near_minhash", "q_sim_cosine_topk", "q_topk", "q_window_sliding")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // match the bench session exactly (Bench.scala): ANSI changes
      // expression trees, so a plan audited here must be the plan the
      // bench runs
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      SparkEntry.queries.get(k) match {
        case Some(fn) => println(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        case None => println(s"unknown query: $k")
      }
    }
    spark.stop()
  }
}
