package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: warm-then-time individual declared queries at sf0.1
  * with the same materialization Bench uses (noop sink). Usage:
  * `runMain graft.TimeQuery q_agg_basic q_dedup_minhash ...` */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableLoader.warm(spark, sfDir)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
