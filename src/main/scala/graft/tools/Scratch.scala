package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway component-timing experiments for the optimization round.
  * Not part of any query path; deleted or emptied when the experiment
  * concludes (findings land in OPTIMIZATION_r14.md). */
object Scratch {
  def time[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableLoader.warm(spark, sfDir)

    // ---- q_bootstrap_ci component triage ----
    val base = graft.sources.TableLoader.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"),
        round(col("o_totalprice") * 100).cast("bigint").as("cents"))
    val chunks = base
      .select(col("k"), col("cents"),
        explode(sequence(lit(0), lit(12))).as("c"))
    val withMd5 = chunks
      .withColumn("h",
        md5(concat(col("k").cast("string"), lit("-"),
          col("c").cast("string")).cast("binary")))
    val withConv = withMd5
      .withColumn("x1",
        conv(substring(col("h"), 1, 15), 16, 10).cast("bigint"))
      .withColumn("x2",
        conv(substring(col("h"), 16, 15), 16, 10).cast("bigint"))
    for (_ <- 1 to 3) {
      time("base scan")(noop(base))
      time("explode 13x")(noop(chunks))
      time("+md5")(noop(withMd5))
      time("+conv x2")(noop(withConv))
      time("full query")(noop(
        graft.SparkEntry.queries("q_bootstrap_ci")(spark, sfDir)))
    }
    spark.stop()
  }
}
