package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Dedup.semDeDup]] — k-means-celled embedding dedup (SemDeDup):
  * planted semantic cliques collapse to their min-id survivor, the
  * survivor rows partition the corpus, null vectors pass as singletons,
  * and because within-cell pairs are a SUBSET of the exact pair set the
  * grouping can only refine the brute-force components — never merge
  * across them.
  */
class SemDeDupSpec extends SparkTestBase {
  import spark.implicits._

  // 4 orthogonal base directions in 8-dim, 3 near-copies each (tiny
  // perturbation in a disjoint dimension). Ids interleave so the first
  // k = 4 seed vectors are one per clique — Lloyd then converges each
  // cell onto one base and the test exercises real sub-cell grouping.
  private def planted = {
    val rows = for {
      ci <- 0 until 4
      j <- 0 until 3
    } yield {
      val v = Array.fill(8)(0f)
      v(ci) = 1f
      v(4 + ci) = 0.01f * (j + 1)
      ((j * 10 + ci).toLong, Some(v.toSeq))
    }
    (rows :+ ((99L, Option.empty[Seq[Float]])))
      .toDF("vec_id", "embedding")
  }

  test("planted cliques collapse to min-id survivors; nulls pass as singletons") {
    val out = Dedup.semDeDup(planted, "embedding", "vec_id",
        maxDistance = 0.1, k = 4, iters = 2)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    // survivors: the j = 0 member of each clique (ids 0-3) + the null row
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 99L))
    assert(out.take(4).forall(_._3 == 3L), s"clique sizes: ${out.toSeq}")
    assert(out.last == ((99L, None, 1L)))
    // group sizes partition the corpus
    assert(out.map(_._3).sum == 13L)
  }

  test("cells refine brute-force components: brute survivors subset sem survivors") {
    val sub = table("embeddings").filter(col("vec_id") < 200)
    val sem = Dedup.semDeDup(sub, "embedding", "vec_id",
        maxDistance = 0.6, k = 4, iters = 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val pairs = Dedup.embeddingNearDupPairs(sub, "embedding", "vec_id",
      maxDistance = 0.6)
    val nonMin = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("comp"))
      .collect().map(_.getLong(0)).toSet
    val brute = sub.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet -- nonMin
    assert(brute.subsetOf(sem),
      s"${brute.diff(sem).size} brute survivors dropped by semDeDup")
    assert(sem.size >= brute.size)
  }
}
