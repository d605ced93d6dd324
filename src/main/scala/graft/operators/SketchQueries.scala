package graft.operators

import org.apache.spark.sql.functions._

import graft.QDef
import graft.sources.TableLoader._

/** Mergeable-sketch cardinality (Apache DataSketches HLL via Spark 4's
  * hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
  *
  * This is the 100 TB cardinality pattern: each partition/group builds
  * a fixed-size (≤ 2^lgK registers) sketch, sketches merge by
  * register-wise max — associative, commutative, and EXACTLY equal to
  * the sketch built over the unioned data — so a global distinct count
  * needs one tiny all-to-one merge instead of a full shuffle of the
  * distinct keys. approx_count_distinct gives the same answer shape but
  * its sketch never leaves the plan; materialized sketches (this query)
  * can be persisted per day/shard and re-merged incrementally, which is
  * what a training-data pipeline tracking token/URL/user cardinality
  * across snapshots actually needs.
  *
  * No DuckDB oracle — the sketch binary is engine-specific; SketchSpec
  * asserts the merge identity and the error bound against exact counts.
  */
object SketchQueries {

  /** Per-event-type HLL user sketches + the merged global estimate as a
    * final `_all_` row (the per-shard → global re-merge shape). */
  val qHllSketchMerge: QDef = QDef.noOracle("q_hll_sketch_merge") { (s, d) =>
    val perType = events(s, d)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val typed = perType
      .select(col("event_type"),
        hll_sketch_estimate(col("sk")).as("distinct_users"))
    val global = perType
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("distinct_users"))
      .select(lit("_all_").as("event_type"), col("distinct_users"))
    typed.unionByName(global).orderBy(col("event_type"))
  }

  val defs: Seq[QDef] = Seq(qHllSketchMerge)
}
