package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[FuzzyJoin.editDistancePairs]]: exact equality with the brute-force
  * quadratic scan on a corpus with planted edits of every kind and at
  * every position class (prefix/interior/suffix; insert, delete,
  * substitute, combinations up to k) — the completeness property the
  * segment-pigeonhole blocking claims — plus rejection just above k and
  * the short-string exclusion contract.
  */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def brute(df: org.apache.spark.sql.DataFrame,
      k: Int): Set[(Long, Long, Int)] = {
    val s = df.select(col("doc_id").as("id"), col("t"))
      .filter(length(col("t")) >= k + 1)
    s.as("a").join(s.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.t"), col("b.t")).as("d"))
      .filter(col("d") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def pairs(df: org.apache.spark.sql.DataFrame,
      k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistancePairs(df, "t", "doc_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("equals brute force with edits planted at every position class") {
    val bases = (0 until 60).map(i =>
      (i.toLong, s"record ${(i * 2654435761L) % 999983} entry $i"))
    val mutated = bases.flatMap { case (id, t) =>
      Seq(
        (id + 1000, t.drop(1)),                      // prefix delete
        (id + 2000, t.dropRight(1) + "X"),           // suffix substitute
        (id + 3000, t.take(8) + "Z" + t.drop(8)),    // interior insert
        (id + 4000, "Q" + t.drop(2)),                // prefix sub+delete (ed 2)
        (id + 5000, t.take(5) + t.drop(7))           // interior double delete
      )
    }
    val df = (bases ++ mutated).toDF("doc_id", "t")
    (1 to 3).foreach { k =>
      assert(pairs(df, k) == brute(df, k), s"mismatch at k = $k")
    }
  }

  test("pairs just above the threshold are rejected") {
    val df = Seq(
      (1L, "abcdefghij"), (2L, "abcdefgh"),      // ed 2
      (3L, "abcdeXYZij"), (4L, "zzzzzzzzzz"))    // 3 vs 1: ed 3
      .toDF("doc_id", "t")
    val got = pairs(df, 2)
    assert(got == Set((1L, 2L, 2)), got.toString)
  }

  test("cross-table linkage equals the brute cross scan; key overlap is safe") {
    val a = (0 until 50).map(i =>
      (i.toLong, s"item ${(i * 2654435761L) % 999983} code $i")).toDF("doc_id", "t")
    // catalog B reuses SOME of A's key values (overlap must not suppress
    // pairs — cross form never compares ids), with planted edits
    val b = (0 until 50).map { i =>
      val base = s"item ${(i * 2654435761L) % 999983} code $i"
      val mutated =
        if (i % 3 == 0) base.drop(1) else if (i % 4 == 0) base + "?" else base
      (i.toLong / 2, mutated)
    }.toDF("doc_id", "t")
    (1 to 2).foreach { k =>
      val got = FuzzyJoin.editDistanceJoin(a, b, "t", "doc_id", k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val brute = a.select(col("doc_id").as("ia"), col("t").as("ta"))
        .crossJoin(b.select(col("doc_id").as("ib"), col("t").as("tb")))
        .select(col("ia"), col("ib"), levenshtein(col("ta"), col("tb")).as("d"))
        .filter(col("d") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      assert(got == brute, s"mismatch at k = $k") // multiset: dup B keys kept
    }
  }

  test("strings shorter than k+1 are excluded, not crashed on") {
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, "abcd"), (4L, "abcd"))
      .toDF("doc_id", "t")
    // k = 2: "ab" (len 2 < 3) is out; the identical "abcd"s pair at ed 0
    assert(pairs(df, 2) == Set((3L, 4L, 0)))
  }
}
