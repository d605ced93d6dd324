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
    // per-row salt on the skewed side; spark_partition_id+row position
    // based salts would also do — the salt only needs to spread rows,
    // never to be stable across runs (output is salt-independent)
    val salted = big.withColumn(
      "__salt", pmod(monotonically_increasing_id(), lit(n.toLong)))
    val replicated = small.withColumn(
      "__salt", explode(array((0 until n).map(i => lit(i.toLong)): _*)))
    val cond: Column = keys
      .map(k => salted(k) === replicated(k))
      .reduce(_ && _) && salted("__salt") === replicated("__salt")
    val joined = salted.join(replicated, cond)
    (keys.map(replicated(_)) ++ Seq(replicated("__salt"), salted("__salt")))
      .foldLeft(joined)((df, c) => df.drop(c))
  }
}
