package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one registered query
  * (`ExplainQ <name> [sfDir]`) — the iterate-on-the-plan loop the build
  * mandate asks for, runnable from compiled classes without sbt. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args(0)
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val q = SparkEntry.registry.find(_.name == name)
      .getOrElse(sys.error(s"unknown query: $name"))
    q.fn(spark, d).explain("formatted")
    spark.stop()
  }
}
