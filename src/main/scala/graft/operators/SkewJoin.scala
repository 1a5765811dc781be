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
    * The salt mixes a hash of the full fact row with a per-row
    * disambiguator (`monotonically_increasing_id`): the row hash alone
    * would funnel EXACT-DUPLICATE rows of a hot key — the pathological
    * skew case (a null-ish default row repeated millions of times) —
    * back into one partition, because identical rows hash identically.
    * The disambiguator is partition-deterministic (task retries recompute
    * the same ids from the same partition contents), and which salt a row
    * lands on never affects the result set — only the spread.
    * `other` is replicated `nSalts`× via one generator (no shuffle before
    * the join); the join itself is hinted shuffle-hash so the
    * demonstrated plan is the one salting exists for — with a
    * broadcastable right side Spark would otherwise elide the exchange
    * this operator is spreading.
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
    // collision-safe internal name: extend until absent from BOTH inputs
    // (a user column named __salt, or a Map-typed column breaking the
    // struct hash, must not corrupt the join)
    var saltCol = "__graft_salt"
    while (facts.columns.contains(saltCol) || other.columns.contains(saltCol))
      saltCol += "_"
    // hash only hashable (non-Map) columns; the mid disambiguator alone
    // already guarantees the spread, the row hash just decorrelates it
    // from the physical row order
    val hashable = facts.schema.fields
      .filter(f => !hasMapType(f.dataType)).map(f => col(f.name))
    val rowHash =
      if (hashable.isEmpty) monotonically_increasing_id()
      else xxhash64((hashable :+ monotonically_increasing_id()): _*)
    val salted = facts.withColumn(saltCol, pmod(rowHash, lit(nSalts)))
    val replicated = other.withColumn(saltCol,
      explode(array((0 until nSalts).map(s => lit(s)): _*)))
    salted.join(replicated.hint("shuffle_hash"), keys :+ saltCol, joinType)
      .drop(saltCol)
  }

  private def hasMapType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
      case a: ArrayType => hasMapType(a.elementType)
      case _ => false
    }
  }
}
