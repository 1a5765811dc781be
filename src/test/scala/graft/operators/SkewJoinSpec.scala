package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SkewJoin.saltedJoin]]: result parity with the plain join (inner and
  * left-outer, unmatched facts included), the plan actually joins on
  * (key, salt) through a shuffled-hash join (no broadcast — the regime
  * salting exists for), and a planted hot key's rows spread across
  * partitions instead of funneling through one.
  */
class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of fact rows carry the hot key 7; dim covers keys 0-9 only, so
  // facts with key 10 exercise the unmatched left-outer path
  private def facts = (0 until 2000).map { i =>
    val k = if (i % 10 != 0) 7L else (i / 10 % 11).toLong
    (i.toLong, k, s"payload$i")
  }.toDF("row_id", "k", "payload")

  private def dim = (0 until 10).map(k => (k.toLong, s"meta$k"))
    .toDF("k", "meta")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String, String)] =
    df.select($"row_id", $"k", $"payload", $"meta").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet

  test("salted join result equals the plain join, inner and left_outer") {
    val plainInner = rows(facts.join(dim, Seq("k")))
    val saltedInner = rows(SkewJoin.saltedJoin(facts, dim, Seq("k"), nSalts = 8))
    assert(saltedInner == plainInner)
    val plainLeft = rows(facts.join(dim, Seq("k"), "left_outer"))
    val saltedLeft = rows(
      SkewJoin.saltedJoin(facts, dim, Seq("k"), nSalts = 8, "left_outer"))
    assert(saltedLeft == plainLeft)
    // unmatched facts (key 10) really flowed through the outer path once
    assert(saltedLeft.exists(_._4 == null))
    assert(saltedLeft.count(_._4 == null) == plainLeft.count(_._4 == null))
  }

  // AQE's runtime coalescing would merge these deliberately tiny
  // partitions and mask exactly the shapes under test
  private def withoutAqe[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("plan joins on (key, salt) via shuffled-hash, not broadcast") {
    withoutAqe {
      val plan = SkewJoin.saltedJoin(facts, dim, Seq("k"), nSalts = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"), plan.take(500))
      assert(!plan.contains("BroadcastHashJoin"), plan.take(500))
      assert(plan.contains("__graft_salt"), plan.take(500))
    }
  }

  test("exact-duplicate hot-key rows still spread; user __graft_salt column survives") {
    withoutAqe {
      // the pathological case a row-hash-only salt cannot spread: ONE row
      // value repeated — identical rows hash identically, so without the
      // per-row disambiguator all 2000 land in a single partition
      val dupFacts = (0 until 2000).map(_ => (7L, "same payload"))
        .toDF("k", "payload")
      val salted = SkewJoin.saltedJoin(dupFacts, dim, Seq("k"), nSalts = 8)
      val counts = salted.groupBy(spark_partition_id()).count()
        .collect().map(_.getLong(1))
      assert(counts.max.toDouble / counts.sum < 0.5,
        s"duplicate rows funneled: ${counts.mkString(",")}")
      assert(salted.count() == 2000)
      // a pre-existing column named __graft_salt must pass through intact,
      // not collide with the internal salt
      val clash = facts.withColumn("__graft_salt", lit("user-data"))
      val out = SkewJoin.saltedJoin(clash, dim, Seq("k"), nSalts = 4)
      assert(out.columns.contains("__graft_salt"))
      assert(out.select("__graft_salt").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("user-data"))
      // a Map-typed fact column (unhashable by xxhash64) must not crash
      val mapped = facts.withColumn("m", map(lit("a"), lit(1)))
      assert(SkewJoin.saltedJoin(mapped, dim, Seq("k"), nSalts = 4)
        .count() == facts.join(dim, Seq("k")).count())
    }
  }

  test("hot key spreads across partitions instead of one straggler") {
    withoutAqe {
      def maxPartShare(df: org.apache.spark.sql.DataFrame): Double = {
        val counts = df.groupBy(spark_partition_id()).count()
          .collect().map(_.getLong(1))
        counts.max.toDouble / counts.sum
      }
      val plain = facts.join(dim.hint("shuffle_hash"), Seq("k"))
      val salted = SkewJoin.saltedJoin(facts, dim, Seq("k"), nSalts = 8)
      val plainShare = maxPartShare(plain)
      val saltedShare = maxPartShare(salted)
      // unsalted: key 7 (90% of rows) is one partition; salted: 8-way spread
      assert(plainShare > 0.85, s"expected hot-key funnel, got $plainShare")
      assert(saltedShare < 0.5,
        s"salting left a $saltedShare straggler (unsalted $plainShare)")
    }
  }
}
