package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the reference's defining I/O (SURVEY.md §2.1
  * jdbc_source/jdbc_sink; the Access→PostgreSQL bulk-load half of the
  * migration).
  *
  * Thin and config-gated: no database is reachable in this offline
  * harness (SURVEY §7 risk 8), so the module is exercised by
  * JdbcConnectorSpec only when SPARK_GRAFT_JDBC_URL is set; the option
  * plumbing below is the entire integration surface.
  *
  * Scale notes (the knobs that matter on a 1000-executor cluster):
  *   - reads MUST be partitioned (`partitionColumn` + bounds +
  *     `numPartitions`) or the whole table funnels through one task;
  *   - `pushDownPredicate` is on by default — filters run server-side,
  *     exactly like the reference's WHERE-less COPY but better;
  *   - writes batch via `batchsize` (server round-trips per 10k rows)
  *     and `truncate` avoids DDL churn on overwrite.
  */
object JdbcConnector {

  final case class PartitionSpec(
      column: String, lowerBound: Long, upperBound: Long, numPartitions: Int)

  def read(
      spark: SparkSession,
      url: String,
      table: String,
      partition: Option[PartitionSpec] = None,
      props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("fetchsize", props.getOrElse("fetchsize", "10000"))
    val withPart = partition.fold(base) { p =>
      base
        .option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound)
        .option("upperBound", p.upperBound)
        .option("numPartitions", p.numPartitions)
    }
    props.foldLeft(withPart) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  def write(
      df: DataFrame,
      url: String,
      table: String,
      mode: SaveMode = SaveMode.Append,
      batchSize: Int = 10000,
      props: Map[String, String] = Map.empty): Unit = {
    val w = df.write
      .format("jdbc")
      .mode(mode)
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
    props.foldLeft(w) { case (r, (k, v)) => r.option(k, v) }.save()
  }

  /** One-call migration of a table list — the reference's whole program
    * (enumerate → per-table export → bulk load) as a library function.
    * Source here is any DataFrame provider (the Access-mapped read or a
    * staging lake); target is JDBC. */
  def migrate(
      tables: Seq[(String, DataFrame)],
      url: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    tables.foreach { case (name, df) => write(df, url, name, mode) }
}
