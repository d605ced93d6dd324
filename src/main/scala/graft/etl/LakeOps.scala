package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-layout maintenance — the table-management operators a parquet
  * lake needs at 100 TB (SURVEY §4.3 layout levers):
  *
  *   - `compact`: the small-files problem. Streaming sinks and
  *     fine-grained partitions accumulate files far below the HDFS/S3
  *     sweet spot; every downstream scan then pays per-file open +
  *     footer-read + scheduling. Compaction rewrites a directory into
  *     ~`targetFileBytes` files — a pure repartition-and-rewrite, no
  *     data transformation, safe to run anytime.
  *   - `writePartitioned` with DYNAMIC partition overwrite: an
  *     incremental job that produces a handful of partitions must
  *     replace exactly those partitions. Static overwrite mode would
  *     truncate the whole table first — the classic
  *     accidentally-deleted-the-lake failure; dynamic mode only
  *     replaces partitions present in the written DataFrame.
  */
object LakeOps {

  final case class CompactionReport(
      filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Rewrite the parquet directory at `dir` into files of roughly
    * `targetFileBytes`. The rewrite stages into a sibling directory and
    * swaps via rename, so a concurrent reader sees either the old or
    * the new layout, never a half-written mix. Returns what changed. */
  def compact(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble
      / targetFileBytes).toInt)
    val staging = new Path(dir + "__compacting")
    val backup = new Path(dir + "__precompact")
    // repartition (round-robin) — compaction balances file sizes; it
    // must not depend on any particular row distribution
    spark.read.parquet(dir).repartition(nOut)
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(path, backup))
      throw new java.io.IOException(s"compact: cannot stage $dir aside")
    if (!fs.rename(staging, path)) {
      fs.rename(backup, path) // roll back
      throw new java.io.IOException(s"compact: swap failed for $dir")
    }
    fs.delete(backup, true)
    CompactionReport(files.length, nOut, totalBytes)
  }

  /** Partitioned parquet write with dynamic partition overwrite: only
    * the partitions present in `df` are replaced; all others survive.
    * The session-level overwrite mode is restored afterwards. */
  def writePartitioned(
      df: DataFrame,
      dir: String,
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try df.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
