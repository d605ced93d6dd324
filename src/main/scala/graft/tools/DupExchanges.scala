package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec

/** Dev sweep for the optimization rounds: execute every registered
  * query once (noop-equivalent: drive the DataFrame's own executedPlan)
  * and report queries whose FINAL adaptive plan materialized the same
  * shuffle stage more than once — pipelines recomputed per consumer.
  *
  * Static planning (AQE off) collapses semantically-equal exchanges
  * with ReuseExchange, so a static sweep reports nothing; but under
  * AQE (how Bench/Verify actually run) stage reuse keys on
  * canonicalized stage plans and demonstrably misses shapes involving
  * TableCacheQueryStage / window chains (see plans/r14/
  * q_quantile_normalize_final.txt: stages 15 and 39 identical, both
  * executed). This sweep finds every query paying that recompute.
  *
  * Usage: runMain graft.tools.DupExchanges [sfDir]
  */
object DupExchanges {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableLoader.warm(spark, sfDir)
    for (q <- graft.SparkEntry.registry) {
      try {
        val df = q.fn(spark, sfDir)
        df.queryExecution.executedPlan.execute().count()
        val plan = df.queryExecution.executedPlan
        val stages = plan.collectWithSubqueries {
          case s: ShuffleQueryStageExec => s
        }
        // distinct stage INSTANCES (a reused stage appears as the same
        // object / same stage id), grouped by semantic equality
        val distinctById = stages.groupBy(_.id).map(_._2.head).toSeq
        val groups = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[
            ShuffleQueryStageExec]]
        for (e <- distinctById) {
          groups.find(g => g.head.plan.sameResult(e.plan)) match {
            case Some(g) => g += e
            case None    =>
              groups += scala.collection.mutable.ArrayBuffer(e)
          }
        }
        val dups = groups.filter(_.size > 1)
        if (dups.nonEmpty) {
          val sizes = dups.map(_.size).toSeq.sorted.reverse
          println(s"[dup] ${q.name} dupStages=${sizes.sum} " +
            s"(of ${distinctById.size} materialized) groups=" +
            sizes.mkString(","))
        }
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"[dup] ${q.name} ERROR ${e.getMessage}")
      }
      graft.plans.Checkpoints.sweep(spark)
    }
    spark.stop()
  }
}
