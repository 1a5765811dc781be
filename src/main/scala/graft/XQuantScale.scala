package graft

import org.apache.spark.sql.functions._

import graft.similarity.Knn

/** Quantizer-menu scale measurement (r15): PQ vs OPQ vs RQ at the SAME
  * byte budget (`XQ_M` bytes a vector) on the manifold corpus — the
  * low-intrinsic-dimension shape real embedding models emit, where the
  * latent basis smears structure across every coordinate and a fixed
  * subspace split is at its worst. Prices, per quantizer:
  *  - XQ_TRAIN: codebook(+rotation) training wall on the `XQ_TRAIN_N`
  *    sample (the documented at-scale shape — OPQ's cross-covariance
  *    pass is n·d² exploded cells and MUST run on the sample);
  *  - XQ_ENCODE: full-corpus encode wall + rows/s (the pass that
  *    actually touches all `XQ_N` rows — one codegen projection);
  *  - XQ_RECON: mean ‖x − x̂‖² over the sample (driver-side, exact);
  *  - XQ_RECALL: mean ADC recall@10 vs fp32 brute force over
  *    `XQ_QUERIES` held-out probe vectors, + median probe wall.
  * The menu claim under test: at equal bytes, OPQ ≥ PQ on correlated
  * data (the rotation un-correlates the split) and RQ trades encode
  * cost for full-dimension codewords. Artifacts cache under the
  * Fp16Corpus work root. */
object XQuantScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("XQ_SHUFFLE", "64"))
    val n = sys.env.getOrElse("XQ_N", "2000000").toLong
    val dim = sys.env.getOrElse("XQ_DIM", "64").toInt
    val m = sys.env.getOrElse("XQ_M", "8").toInt
    val ksub = sys.env.getOrElse("XQ_KSUB", "16").toInt
    val trainN = sys.env.getOrElse("XQ_TRAIN_N", "20000").toLong
    val nQueries = sys.env.getOrElse("XQ_QUERIES", "20").toInt
    val sweeps = sys.env.getOrElse("XQ_SWEEPS", "2").toInt
    import spark.implicits._

    val corpus = graft.fixtures.ManifoldCorpus.prepared(spark, n)
      .select(col("vec_id").as("id"),
        slice(graft.functions.fp16_decode(col("emb16")), 1, dim).as("v"))
      .localCheckpoint()
    val trainMod = math.max(1L, n / trainN)
    val sample = corpus.filter(col("id") % trainMod === 0)
      .localCheckpoint()
    val sampleRows: Array[(Long, Array[Float])] = sample
      .as[(Long, Seq[Float])].collect().map { case (i, v) => (i, v.toArray) }
    println(s"XQ_SETUP|n=$n|dim=$dim|m=$m|ksub=$ksub|" +
      s"sample=${sampleRows.length}|sweeps=$sweeps")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // errOf returns one sample vector's squared reconstruction error in
    // the quantizer's OWN space (OPQ measures against R·x — orthonormal
    // R preserves the metric, so the three numbers compare directly)
    def reconErr(errOf: Array[Float] => Double): Double = {
      val errs = sampleRows.map { case (_, v) => errOf(v) }
      errs.sum / errs.length
    }
    def l2sqErr(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
      s
    }
    // fp32 probe vectors (held out: odd ids are never exactly on the
    // trainMod grid when trainMod is even; recall is vs THIS metric)
    val queries = (0 until nQueries).map { q =>
      graft.fixtures.ManifoldCorpus.vector(2L * q + 1).take(dim)
    }
    val exactTop: Seq[Set[Long]] = queries.map { qv =>
      corpus.withColumn("d", Knn.l2sq(col("v"), typedLit(qv)))
        .orderBy(col("d").asc, col("id").asc).limit(10)
        .select(col("id")).as[Long].collect().toSet
    }

    def report(tag: String, trainWall: Double,
        encoded: org.apache.spark.sql.DataFrame,
        errOf: Array[Float] => Double,
        topK: (org.apache.spark.sql.DataFrame, Array[Float]) =>
          Seq[Long]): Unit = {
      val enc = encoded.localCheckpoint()
      val (cnt, encWall) = timed(enc.count())
      println(f"XQ_TRAIN|quant=$tag|wall_s=$trainWall%.1f")
      println(f"XQ_ENCODE|quant=$tag|wall_s=$encWall%.1f|" +
        f"rows_s=${cnt / encWall}%.0f")
      println(f"XQ_RECON|quant=$tag|mean_l2sq=${reconErr(errOf)}%.4f")
      val walls = new Array[Double](queries.length)
      val recalls = queries.zipWithIndex.map { case (qv, i) =>
        val (ids, w) = timed(topK(enc, qv))
        walls(i) = w
        (ids.toSet intersect exactTop(i)).size / 10.0
      }
      val med = walls.sorted.apply(walls.length / 2)
      println(f"XQ_RECALL|quant=$tag|recall10=" +
        f"${recalls.sum / recalls.length}%.3f|probe_s_med=$med%.2f")
    }

    // ---- PQ at m bytes
    val (pqCb, pqWall) = timed(Knn.collectCodebooks(
      Knn.pqTrain(sample, "v", "id", m, ksub, iters = 2)))
    report("pq", pqWall,
      Knn.pqEncode(corpus, "v", "id", pqCb),
      v => l2sqErr(v, floats(graft.functions.RotMath.decode(
        graft.functions.PqMath.encode(arr(v), pqCb), pqCb))),
      (enc, qv) => Knn.pqTopK(enc, pqCb, qv, 10)
        .select(col("id")).as[Long].collect().toSeq)

    // ---- OPQ: same codes, learned rotation ahead of the split
    val ((rot, opqCb), opqWall) = timed(
      Knn.opqTrain(sample, "v", "id", m, ksub, iters = 2, sweeps = sweeps))
    val rotatedCorpus = corpus.select(col("id"),
      graft.functions.mat_vec_rotate(col("v"), rot).as("v"))
    report("opq", opqWall,
      Knn.pqEncode(rotatedCorpus, "v", "id", opqCb),
      v => {
        val rv = graft.functions.RotMath.rotateLocal(v, rot)
        l2sqErr(rv, floats(graft.functions.RotMath.decode(
          graft.functions.PqMath.encode(arr(rv), opqCb), opqCb)))
      },
      (enc, qv) => Knn.pqTopK(enc, opqCb,
          graft.functions.RotMath.rotateLocal(qv, rot), 10)
        .select(col("id")).as[Long].collect().toSeq)

    // ---- RQ: m full-dimension stages at the same m bytes
    val (rqCb, rqWall) = timed(Knn.collectRqCodebooks(
      Knn.rqTrain(sample, "v", "id", stages = m, ksub = ksub, iters = 2)))
    report("rq", rqWall,
      Knn.rqEncode(corpus, "v", "id", rqCb),
      v => {
        val codes = graft.functions.RqMath.encode(arr(v), rqCb)
        val xh = new Array[Float](dim)
        codes.zipWithIndex.foreach { case (c, st) =>
          val cw = rqCb(st)(c & 0xff)
          var i = 0
          while (i < dim) { xh(i) = xh(i) + cw(i); i += 1 }
        }
        l2sqErr(v, xh)
      },
      (enc, qv) => Knn.rqTopK(enc, rqCb, qv, 10)
        .select(col("id")).as[Long].collect().toSeq)

    spark.stop()
  }

  private def arr(v: Array[Float]) =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v)
  private def floats(a: org.apache.spark.sql.catalyst.util.ArrayData) =
    a.toFloatArray()
}
