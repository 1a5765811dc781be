package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-joins for keys whose value distribution would
  * otherwise funnel a partition-sized share of a 100 TB fact table
  * through one task.
  *
  * A shuffled equi-join hash-partitions both sides by the key, so a hot
  * key (a null-ish default, a celebrity user, a boilerplate source tag)
  * lands its ENTIRE row population in one partition — the straggler that
  * dominates stage wall-clock no matter how many executors idle. Salting
  * splits each key's rows across `nSalts` sub-partitions: the fact side
  * tags every row with a deterministic salt in [0, nSalts), the other
  * side is replicated once per salt value, and the join key becomes
  * (key, salt) — same result set, `nSalts`-way spread of every key.
  *
  * When is this needed, given Spark's own remedies?
  *  - `broadcast(dim)` is strictly better when the non-skewed side fits
  *    in executor memory — salting is for when BOTH sides are too big.
  *  - AQE's skew-join (`spark.sql.adaptive.skewJoin.enabled`) splits
  *    oversized partitions at runtime, but only for sort-merge joins,
  *    only above its size thresholds, and only per-stage; explicit
  *    salting also covers shuffled-hash joins, guarantees the spread
  *    regardless of runtime stats, and keeps the spread through
  *    downstream stages that reuse the (key, salt) partitioning.
  *
  * The replicated side grows `nSalts`×; size `nSalts` to the skew factor
  * (hot-key share × partition count), not higher.
  */
object SkewJoin {

  /** Inner/left-outer equi-join of a skewed `facts` table against
    * `other` on `keys`, spread `nSalts` ways per key.
    *
    * The salt is derived from a hash of the full fact row — deterministic
    * for a given row (re-runs and task retries salt identically) while
    * spreading a hot key's rows uniformly. `other` is replicated
    * `nSalts`× via one generator (no shuffle before the join); the join
    * itself is hinted shuffle-hash so the demonstrated plan is the one
    * salting exists for — with a broadcastable right side Spark would
    * otherwise elide the exchange this operator is spreading.
    *
    * `joinType` must be "inner" or "left_outer": for these, replicating
    * the non-fact side per salt provably preserves the unsalted result
    * (each fact row matches exactly the replica set carrying its salt);
    * right/full-outer would emit unmatched `other` replicas once PER
    * SALT and are rejected. */
  def saltedJoin(facts: DataFrame, other: DataFrame, keys: Seq[String],
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"saltedJoin: nSalts must be >= 1, got $nSalts")
    require(joinType == "inner" || joinType == "left_outer",
      s"saltedJoin: only inner/left_outer preserve unsalted semantics " +
        s"under replication, got $joinType")
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(struct(facts.columns.map(col): _*)), lit(nSalts)))
    val replicated = other.withColumn("__salt",
      explode(array((0 until nSalts).map(s => lit(s)): _*)))
    salted.join(replicated.hint("shuffle_hash"), keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
