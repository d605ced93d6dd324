package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the first-line 100 TB skew answer
  * (SURVEY.md §4.3): a deliberately skewed join (one key holds ~90% of
  * rows) must get its hot partition split at runtime once the skew
  * thresholds are scaled to test-sized data. SkewJoin.saltedInnerJoin
  * is the deterministic fallback; this spec proves the adaptive path
  * actually engages. */
class SkewAqeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session

  import spark.implicits._

  test("AQE splits the skewed partition of a hot-key join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // ~90% of 500k fact rows share key 0; dim side is uniform. The
      // pad column is aggregated after the join so column pruning can't
      // shrink the skewed shuffle.
      val fact = spark.range(500000)
        .select(
          when($"id" % 10 =!= 0, lit(0L)).otherwise($"id" % 1000)
            .as("k"),
          concat(lit("payload-payload-payload-payload-payload-"), $"id")
            .as("pad"))
      val dim = spark.range(1000)
        .select($"id".as("k"), concat(lit("d"), $"id").as("tag"))
      val joined = fact.join(dim, "k").groupBy("tag")
        .agg(count(lit(1)).as("n"), sum(length($"pad")).as("bytes"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
