package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anisotropic vector quantization (Guo, Sun, Lindgren et al., ICML
  * 2020 — the ScaNN codec): k-means whose loss weights the component of
  * the residual PARALLEL to the data point `eta` times the orthogonal
  * component,
  *
  *   L(x, c) = η·‖r∥‖² + ‖r⊥‖²
  *           = (η − 1)·(⟨x − c, x⟩)²/‖x‖² + ‖x − c‖²,
  *
  * because for maximum-inner-product search the parallel error is the
  * one that corrupts ⟨q, x⟩ estimates for the queries that MATTER (those
  * scoring x highly) — L2-optimal codebooks spend their budget evenly
  * and mis-rank exactly the high-scoring tail. η = 1 degenerates to
  * plain L2 Lloyd; the paper's T-threshold form maps to a constant η
  * when norms are comparable.
  *
  * Training alternates the exact anisotropic argmin assignment with the
  * closed-form codeword update: per cell S,
  *
  *   A = (η − 1)·Σ_{x∈S} x·xᵀ/‖x‖² + |S|·I,   c = A⁻¹ · η·Σ_{x∈S} x
  *
  * (set the gradient of Σ L to zero; a d×d solve per cell). Scale
  * shape, same discipline as every trainer here: the assignment is one
  * broadcast pass; the update's sufficient statistics are the d² scaled
  * outer-product cells and the d vector sums, both accumulated in
  * DECIMAL(38,12) — order-independent, so training is deterministic
  * under any partitioning — and the k little solves are driver-side
  * breeze LU. Train on a sample at corpus scale; assignment/search
  * passes are the only full scans.
  *
  * The ASSIGNMENT/scoring half is SQL-replicable (dot expansions — the
  * q109 float discipline) and oracle-gated (q156); the learned UPDATE's
  * quality (MIPS recall@10 above the L2 codebook's at equal ksub) is
  * AnisotropicSpec's measured gate, the OPQ split of oracle duties. */
object Anisotropic {

  /** The anisotropic loss of `v` against codeword `c` as a Column —
    * `(η−1)·⟨v−c, v⟩²/⟨v,v⟩ + ‖v−c‖²` with every dot the sequential
    * double expansion ([[Knn.l2sq]]'s trees), SQL-replicable term for
    * term. */
  def loss(v: Column, c: Column, eta: Double): Column = {
    val dvv = graft.functions.dot_product(v, v)
    val dvc = graft.functions.dot_product(v, c)
    // ⟨v − c, v⟩ = ⟨v,v⟩ − ⟨v,c⟩; ‖v − c‖² via the dot expansion
    val rpar = dvv - dvc
    lit(eta - 1.0) * rpar * rpar / dvv + Knn.l2sq(v, c)
  }

  /** Assign every vector to its anisotropic-loss-nearest centroid —
    * ties toward the lower centroid id. Exchange carries (id, cid,
    * loss) only; vectors re-attach by one id join ([[Knn.cellPicks]]'s
    * shape via the same bounded-heap rank). */
  def assign(corpus: DataFrame, vecCol: String, keyCol: String,
      centroids: DataFrame, eta: Double): DataFrame = {
    val c = corpus.select(col(keyCol).as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    val cents = centroids.select(col("centroid_id"), col("cvec"))
    c.join(Knn.cellPicks(c, cents, nprobe = 1,
        (v, cv) => loss(v, cv, eta)).drop("crank"), Seq("id"))
  }

  /** Train `k` anisotropic codewords (seeds = the k lowest-key vectors,
    * the engine-wide deterministic draw). Returns (centroid_id, cvec)
    * like [[Knn.trainCentroids]]. */
  def train(corpus: DataFrame, vecCol: String, keyCol: String, k: Int,
      iters: Int, eta: Double): DataFrame = {
    require(k >= 1 && iters >= 0 && eta >= 1.0,
      s"anisotropic train: need k >= 1, iters >= 0, eta >= 1, got " +
        s"k=$k iters=$iters eta=$eta")
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(keyCol).as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    val dim = c.select(size(col("v"))).head().getInt(0)
    var cents: Seq[(Long, Seq[Float])] =
      c.orderBy(col("id").asc).limit(k).select(col("v"))
        .collect().toSeq.zipWithIndex
        .map { case (r, i) => (i.toLong, r.getSeq[Float](0)) }
    for (_ <- 0 until iters) {
      val centsDf = cents.toDF("centroid_id", "cvec")
      val assigned = assign(c, "v", "id", centsDf, eta)
      // sufficient statistics per cell: |S|, Σx (d cells), Σ x·xᵀ/‖x‖²
      // (d² cells) — every sum DECIMAL-exact so the trained codebook is
      // partition-order-deterministic
      val withNorm = assigned.withColumn("nsq",
        graft.functions.dot_product(col("v"), col("v")))
      val sx = withNorm
        .select(col("centroid_id"), posexplode(col("v")).as(Seq("i", "xi")))
        .groupBy(col("centroid_id"), col("i"))
        .agg(sum(col("xi").cast("double").cast("decimal(38,12)")).as("s"),
          count(lit(1)).as("cnt"))
        .collect().map(r => (r.getLong(0), r.getInt(1),
          r.getDecimal(2).doubleValue(), r.getLong(3)))
      val sxx = withNorm
        .select(col("centroid_id"), col("nsq"),
          posexplode(col("v")).as(Seq("i", "xi")), col("v"))
        .select(col("centroid_id"), col("i"), col("xi"), col("nsq"),
          posexplode(col("v")).as(Seq("j", "xj")))
        .groupBy(col("centroid_id"), col("i"), col("j"))
        .agg(sum((col("xi").cast("double") * col("xj").cast("double") /
          col("nsq")).cast("decimal(38,12)")).as("s"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getDecimal(3).doubleValue()))
      val counts = sx.groupBy(_._1).view.mapValues(_.head._4).toMap
      val sxMap = sx.map { case (cid, i, s, _) => (cid, i) -> s }.toMap
      val sxxMap = sxx.map { case (cid, i, j, s) => (cid, i, j) -> s }.toMap
      cents = cents.map { case (cid, prev) =>
        counts.get(cid) match {
          case None => (cid, prev) // empty cell keeps its codeword
          case Some(n) =>
            val a = breeze.linalg.DenseMatrix.tabulate[Double](dim, dim) {
              (i, j) =>
                (eta - 1.0) * sxxMap.getOrElse((cid, i, j), 0.0) +
                  (if (i == j) n.toDouble else 0.0)
            }
            val b = breeze.linalg.DenseVector.tabulate[Double](dim)(i =>
              eta * sxMap.getOrElse((cid, i), 0.0))
            val sol = a \ b
            (cid, Seq.tabulate(dim)(i => sol(i).toFloat))
        }
      }
    }
    cents.toDF("centroid_id", "cvec")
  }

  /** MIPS shortlist-then-re-rank over a quantized corpus: stage 1 ranks
    * every row by its CODEWORD's inner product with the query (ksub
    * distinct values — the scan reads (id, centroid_id) plus a
    * broadcast score map, never a vector), keeps `shortlist`
    * candidates; stage 2 re-scores exactly those rows by true ⟨q, x⟩
    * and keeps k. The ScaNN serving shape; recall is the codebook's
    * quality dial — the anisotropic loss exists to make THIS ranking
    * right. */
  def mipsTopK(assigned: DataFrame, centroids: Seq[(Long, Array[Float])],
      queryVec: Array[Float], k: Int, shortlist: Int): DataFrame = {
    val scores = centroids.map { case (cid, cv) =>
      var s = 0.0
      var i = 0
      while (i < cv.length) { s += queryVec(i).toDouble * cv(i); i += 1 }
      (cid, s)
    }.toMap
    val spark = assigned.sparkSession
    import spark.implicits._
    val scoreDf = broadcast(scores.toSeq.toDF("centroid_id", "qc"))
    assigned.join(scoreDf, Seq("centroid_id"))
      .orderBy(col("qc").desc, col("id").asc)
      .limit(shortlist)
      .withColumn("ip",
        graft.functions.dot_product(col("v"), typedLit(queryVec)))
      .orderBy(col("ip").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("ip"))
  }
}
