package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupQueries
import graft.sources.TableLoader

/** End-to-end corpus deduplication: the user-facing composition of the
  * dedup primitives (SURVEY.md §2.9) into "give me back a clean
  * corpus".
  *
  * Policy is the standard greedy keep-lowest-id: exact duplicates keep
  * the md5 group's minimum doc_id; near-duplicates drop the HIGHER id
  * of every verified candidate pair. Greedy pair-dropping is the usual
  * at-scale choice — full transitive clustering needs iterative
  * connected components, which costs multiple shuffle rounds for
  * marginal corpus-quality gain (chains of near-dups are rare below
  * jaccard ~0.8).
  */
object DedupPipeline {

  /** Remove exact duplicates (byte-identical text), keeping the lowest
    * doc_id of each group. One hash-groupBy + one semi join. */
  def dropExactDuplicates(docs: DataFrame): DataFrame = {
    val keep = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    docs.join(keep, "doc_id").select(docs.columns.map(docs(_)): _*)
  }

  /** Remove near-duplicates via MinHash+LSH candidates verified at
    * `threshold` Jaccard: the higher doc_id of each verified pair is
    * dropped (anti join — no O(n²) anywhere). */
  def dropNearDuplicates(
      s: SparkSession, d: String, threshold: Double = 0.5): DataFrame = {
    val docs = TableLoader.documents(s, d)
    val losers = verifiedPairs(s, d, threshold)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Verified near-dup candidate pairs at `threshold`, memoized and
    * persisted per (session, sfDir, threshold): both dedup policies
    * (greedy + transitive) and repeated invocations consume the same
    * pair set, so the banded self-join + Jaccard verify runs once per
    * session — the pair set is an INDEX, like the shingle cache it is
    * derived from. */
  def verifiedPairs(
      s: SparkSession, d: String, threshold: Double): DataFrame =
    graft.sources.SessionCache.getOrElseUpdate(
      s, ("neardup_pairs", d, threshold)) {
      val p = DedupQueries.qDedupMinhash.fn(s, d)
        .filter(col("jaccard") >= threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count() // materialize once, at cache-fill time
      p
    }

  /** Transitive variant: cluster the verified pairs with connected
    * components and keep ONE canonical doc (min doc_id) per cluster.
    * Differs from the greedy pairwise policy when similarity chains
    * A~B~C lack the direct A~C pair: the greedy form can keep both A
    * and C (each only "loses" against B), the transitive form keeps
    * exactly one representative of the whole chain — the policy large
    * corpus dedup pipelines usually want. */
  def dropNearDuplicatesTransitive(
      s: SparkSession, d: String, threshold: Double = 0.5): DataFrame = {
    val docs = TableLoader.documents(s, d)
    val pairs = verifiedPairs(s, d, threshold)
    val losers = ConnectedComponents
      .dedupGroups(pairs, "doc_a", "doc_b")
      .filter(!col("keep"))
      .select(col("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }
}
