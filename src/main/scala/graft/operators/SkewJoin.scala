package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §7 risk/scale note 7).
  *
  * AQE's skew-join splitting is the first-line answer; explicit salting
  * is the deterministic fallback when one key dominates so heavily that
  * even split shuffle partitions overload (the classic null-key or
  * power-law fact join at 100 TB).
  *
  * Mechanics: the big (skewed) side gets a per-row salt in [0, n); the
  * small side is replicated n times, once per salt value; the join key
  * becomes (key, salt), spreading each hot key over n reducers. Salt
  * values never appear in the output, so the result set is identical to
  * the unsalted join.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `keys`, salted `n` ways. */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      n: Int): DataFrame = {
    require(n > 0)
    // Deterministic content-derived salt, NOT monotonically_increasing_id:
    // a nondeterministic salt feeding a shuffle join means a partially
    // recomputed map stage (fetch failure on a big cluster — exactly the
    // setting this utility targets) can re-salt rows differently than the
    // original attempt and duplicate or drop join rows (the SPARK-23207
    // class of bug). Hashing the whole row reproduces identical salts on
    // recomputation. Known trade-off: byte-identical duplicate rows share
    // a salt, so a hot key composed mostly of EXACT duplicate rows still
    // skews — if that is your data, add a stable discriminator column
    // upstream (an ingest line number / offset) and it will spread.
    // MapType columns are excluded from the hash (Spark disallows
    // hashing maps); they virtually never carry the row's identity.
    val hashable = big.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => big(f.name))
    require(hashable.nonEmpty,
      "saltedInnerJoin: no hashable (non-map) columns to derive a salt from")
    val salted = big.withColumn(
      "__salt", pmod(xxhash64(struct(hashable.toIndexedSeq: _*)),
        lit(n.toLong)))
    val replicated = small.withColumn(
      "__salt", explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    val cond: Column = keys
      .map(k => salted(k) === replicated(k))
      .reduce(_ && _) && salted("__salt") === replicated("__salt")
    val joined = salted.join(replicated, cond)
    (keys.map(replicated(_)) ++ Seq(replicated("__salt"), salted("__salt")))
      .foldLeft(joined)((df, c) => df.drop(c))
  }

  /** Adaptive variant: salt ONLY the keys whose big-side row count
    * exceeds `hotThreshold`; the cold mass takes the plain join.
    *
    * Always-on salting (above) taxes every row with the replication
    * factor to protect against the few keys that need it. Splitting on
    * an exact heavy-hitter census costs one partial-aggregated pass
    * over the big side (map-side combine → the census shuffles one row
    * per distinct key, and only keys past the threshold survive), and
    * the hot-key set is tiny BY CONSTRUCTION — at most |big| /
    * hotThreshold keys can exceed the threshold — so it broadcasts to
    * both semi/anti splits and the small-side filter. The union of the
    * two joins is row-identical to the plain join: every (key, row)
    * lands in exactly one branch. */
  def saltedInnerJoinHot(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      n: Int,
      hotThreshold: Long): DataFrame = {
    require(hotThreshold > 0)
    val keyCols = keys.map(big(_))
    val hotKeys = big.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > hotThreshold)
      .drop("__cnt")
    val bigHot = big.join(broadcast(hotKeys), keys, "left_semi")
    val bigCold = big.join(broadcast(hotKeys), keys, "left_anti")
    val smallHot = small.join(broadcast(hotKeys), keys, "left_semi")
    val cold = bigCold.join(small, keys)
    val hot = saltedInnerJoin(bigHot, smallHot, keys, n)
    // align column order: join output is keys ++ big-rest ++ small-rest
    // in both branches
    cold.union(hot.select(cold.columns.map(col).toIndexedSeq: _*))
  }
}
