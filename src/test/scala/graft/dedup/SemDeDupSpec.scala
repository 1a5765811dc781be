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

  test("nprobe=2 multi-assignment recovers cross-cell pairs: recall strictly improves") {
    val sub = table("embeddings").filter(col("vec_id") < 300)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.embeddingNearDupPairs(sub, "embedding",
      "vec_id", maxDistance = 0.6))
    val cents = graft.similarity.Knn.trainCentroids(sub, "embedding",
      "vec_id", k = 8, iters = 2)
    val p1 = pairSet(Dedup.semDeDupPairs(sub, "embedding", "vec_id",
      maxDistance = 0.6, k = 8, nprobe = 1, centroids = Some(cents)))
    val p2 = pairSet(Dedup.semDeDupPairs(sub, "embedding", "vec_id",
      maxDistance = 0.6, k = 8, nprobe = 2, centroids = Some(cents)))
    // both are exact-verified subsets of the ground truth (no false pairs)
    assert(p1.subsetOf(exact) && p2.subsetOf(exact))
    // multi-assignment only ADDS pairs (the nprobe=1 set is the
    // primary×primary core of the nprobe=2 search)...
    assert(p1.subsetOf(p2))
    // ...and on the bench corpus it genuinely recovers cross-cell pairs
    val (r1, r2) = (p1.size.toDouble / exact.size, p2.size.toDouble / exact.size)
    assert(r2 > r1, s"no recall lift: nprobe=1 $r1 vs nprobe=2 $r2")
    info(f"semDeDupPairs recall vs exact: nprobe=1 $r1%.3f, nprobe=2 $r2%.3f")
  }

  test("blocked pair join: row-identical to the unsalted self-join, every pair exactly once") {
    // the r17 salting spreads the within-cell verify over (cell, sa, sb)
    // blocks — each pair must surface in EXACTLY ONE block (sa/sb are
    // functions of the two ids), so the nprobe=1 branch (which has no
    // distinct() downstream) must emit no duplicates and the full rows
    // (ids AND verified distance) must equal the unsalted reference
    val sub = table("embeddings").filter(col("vec_id") < 300)
    val cents = graft.similarity.Knn.trainCentroids(sub, "embedding",
      "vec_id", k = 8, iters = 2)
    val salted = Dedup.semDeDupPairs(sub, "embedding", "vec_id",
      maxDistance = 0.6, k = 8, nprobe = 1, centroids = Some(cents))
    assert(salted.groupBy(col("id_a"), col("id_b")).count()
      .filter(col("count") > 1).isEmpty, "a pair surfaced in two blocks")
    // unsalted reference: the pre-r17 join shape, inlined
    val assigned = graft.similarity.Knn.ivfAssign(sub, "embedding",
      "vec_id", cents, "cvec", "centroid_id")
    val reference = assigned.as("a").join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        graft.functions.cosine_distance(col("a.v"), col("b.v"))
          .as("distance"))
      .filter(col("distance") < 0.6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    assert(rows(salted) == rows(reference))
  }
}
