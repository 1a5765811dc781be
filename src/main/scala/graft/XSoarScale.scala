package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Knn, Soar}

/** SOAR spilled-assignment scale measurement (r15): single vs spilled
  * IVF on the manifold corpus at `XS_N` rows, priced on BOTH axes the
  * trade lives on —
  *  - XS_ASSIGN: assignment wall, single vs soar (the spilled pass adds
  *    one broadcast re-score of the non-primary cells);
  *  - XS_RECALL: mean recall@10 vs fp32-L2 brute force over
  *    `XS_QUERIES` held-out probes, at nprobe ∈ {1, 2, 4}, single vs
  *    soar, with the mean SCANNED ROWS per probe alongside — SOAR's
  *    posting lists are ~2× single's at equal width, so the honest
  *    comparisons are BOTH soar@w vs single@w (equal probe count) and
  *    soar@w vs single@2w (equal scanned rows).
  * Both sides probe through [[Soar.topKProbes]] (single assignment has
  * no duplicate ids, the min-dedup is a no-op) so the probe kernel is
  * identical and the delta is pure assignment policy. */
object XSoarScale {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("XS_SHUFFLE", "64"))
    val n = sys.env.getOrElse("XS_N", "2000000").toLong
    val dim = sys.env.getOrElse("XS_DIM", "64").toInt
    val cells = sys.env.getOrElse("XS_CELLS", "256").toInt
    val trainN = sys.env.getOrElse("XS_TRAIN_N", "20000").toLong
    val nQueries = sys.env.getOrElse("XS_QUERIES", "20").toInt
    val lambda = sys.env.getOrElse("XS_LAMBDA", "1.0").toDouble
    // XS_FIXTURE=manifold|aniso — `aniso` is the λ term's PAYOFF regime
    // (AnisoCorpus: clustered corpus whose within-cell residuals carry
    // a dominant principal direction; the manifold fixture's residuals
    // are isotropic-noise-dominated and twice measured λ-neutral)
    val fixture = sys.env.getOrElse("XS_FIXTURE", "manifold")
    require(Set("manifold", "aniso").contains(fixture),
      s"XS_FIXTURE must be manifold|aniso, got $fixture")
    import spark.implicits._

    val prepared =
      if (fixture == "aniso") graft.fixtures.AnisoCorpus.prepared(spark, n)
      else graft.fixtures.ManifoldCorpus.prepared(spark, n)
    val qgen: Long => Array[Float] =
      if (fixture == "aniso")
        id => graft.fixtures.AnisoCorpus.vector(id).take(dim)
      else id => graft.fixtures.ManifoldCorpus.vector(id).take(dim)
    val corpus = prepared
      .select(col("vec_id").as("id"),
        slice(graft.functions.fp16_decode(col("emb16")), 1, dim).as("v"))
      .localCheckpoint()
    val trainMod = math.max(1L, n / trainN)
    val sample = corpus.filter(col("id") % trainMod === 0)
    println(s"XS_SETUP|fixture=$fixture|n=$n|dim=$dim|cells=$cells|" +
      s"lambda=$lambda")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val (cents, trainWall) = timed {
      val c = Knn.trainCentroidsL2(sample, "v", "id", k = cells, iters = 2)
        .localCheckpoint()
      c.count()
      c
    }
    println(f"XS_TRAIN|cells=$cells|wall_s=$trainWall%.1f")

    val (single, singleWall) = timed {
      val a = Knn.ivfAssignL2(corpus, "v", "id",
          cents, "cvec", "centroid_id")
        .localCheckpoint()
      a.count(); a
    }
    val (soar, soarWall) = timed {
      val a = Soar.assign(corpus, "v", "id", cents, lambda)
        .localCheckpoint()
      a.count(); a
    }
    // λ=0 — plain second-nearest multi-assignment: the ablation that
    // isolates what the orthogonality term itself buys at equal storage
    val (multi, multiWall) = timed {
      val a = Soar.assign(corpus, "v", "id", cents, lambda = 0.0)
        .localCheckpoint()
      a.count(); a
    }
    println(f"XS_ASSIGN|single_s=$singleWall%.1f|soar_s=$soarWall%.1f|" +
      f"multi_s=$multiWall%.1f")

    // held-out probes: ids >= n are OFF-CORPUS (vector() is a pure
    // function of id, so these are same-distribution draws that exist
    // in no cell) — a corpus-member query would guarantee itself as a
    // recall@10 hit whenever its home cell is probed, inflating
    // low-nprobe recall by up to ~0.1
    val queries = (0 until nQueries).map(q => qgen(n + 2L * q + 1))
    val exactTop: Seq[Set[Long]] = queries.map { qv =>
      corpus.withColumn("d", Knn.l2sq(col("v"), typedLit(qv)))
        .orderBy(col("d").asc, col("id").asc).limit(10)
        .select(col("id")).as[Long].collect().toSet
    }
    val cellSizes: Map[Long, Long] = Map() ++ single
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    val soarSizes: Map[Long, Long] = Map() ++ soar
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()
    val multiSizes: Map[Long, Long] = Map() ++ multi
      .groupBy(col("centroid_id")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect()

    def probedCells(qv: Array[Float], w: Int): Seq[Long] = cents
      .select(col("centroid_id"),
        Knn.l2sq(col("cvec"), typedLit(qv)).as("d"))
      .orderBy(col("d").asc, col("centroid_id").asc).limit(w)
      .select(col("centroid_id")).as[Long].collect().toSeq

    // XS_SKIP_EXACT: jump straight to the ADC section (shortlist-dial
    // re-runs — the exact-scoring ladder doesn't change with it)
    val widths = if (sys.env.contains("XS_SKIP_EXACT")) Nil else Seq(1, 2, 4)
    widths.foreach { w =>
      def run(tag: String, assigned: org.apache.spark.sql.DataFrame,
          sizes: Map[Long, Long]): Unit = {
        val walls = new Array[Double](queries.length)
        var scanned = 0L
        val recalls = queries.zipWithIndex.map { case (qv, i) =>
          scanned += probedCells(qv, w).map(sizes.getOrElse(_, 0L)).sum
          val (ids, wall) = timed(
            Soar.topKProbes(assigned, cents, qv, 10, w)
              .select(col("id")).as[Long].collect().toSet)
          walls(i) = wall
          (ids intersect exactTop(i)).size / 10.0
        }
        val med = walls.sorted.apply(walls.length / 2)
        println(f"XS_RECALL|mode=$tag|nprobe=$w|recall10=" +
          f"${recalls.sum / recalls.length}%.3f|" +
          f"scan_rows_mean=${scanned / queries.length}|" +
          f"probe_s_med=$med%.2f")
      }
      run("single", single, cellSizes)
      run("multi", multi, multiSizes)
      run("soar", soar, soarSizes)
    }

    // ---- the λ term's PAYOFF REGIME: ADC-approximate in-cell scoring
    // (the IVFADC serving default — ADC shortlist, exact refine). The
    // orthogonality-amplified loss exists to cover the primary
    // residual's failure direction, which is precisely the direction
    // PQ codes mis-score; under exact scoring above it measures
    // neutral vs plain second-nearest, so THIS is where any λ payoff
    // must show.
    val mPq = sys.env.getOrElse("XS_PQ_M", "8").toInt
    val ksub = sys.env.getOrElse("XS_PQ_KSUB", "256").toInt
    val shortlist = sys.env.getOrElse("XS_SHORTLIST", "50").toInt
    val cb = Knn.collectCodebooks(
      Knn.pqTrain(sample, "v", "id", mPq, ksub, iters = 2))
    val codes = Knn.pqEncode(corpus, "v", "id", cb)
    def withCodes(assigned: org.apache.spark.sql.DataFrame) = {
      val a = assigned.select(col("id"), col("centroid_id"))
        .join(codes, Seq("id")).localCheckpoint()
      a.count(); a
    }
    val singleC = withCodes(single)
    val multiC = withCodes(multi)
    val soarC = withCodes(soar)
    println(s"XS_ADC_SETUP|m=$mPq|ksub=$ksub|shortlist=$shortlist")
    Seq(1, 2).foreach { w =>
      def runAdc(tag: String,
          coded: org.apache.spark.sql.DataFrame): Unit = {
        val recalls = queries.zipWithIndex.map { case (qv, i) =>
          val probed = probedCells(qv, w)
          val lut = graft.functions.PqMath.lut(qv, cb)
          // ADC shortlist over the probed cells (duplicate copies
          // collapse on the narrow min), then exact fp32 refine
          val short = coded
            .filter(col("centroid_id").isin(probed: _*))
            .withColumn("s",
              graft.functions.pq_adc_score(col("codes"), lut))
            .groupBy(col("id")).agg(min(col("s")).as("s"))
            .orderBy(col("s").asc, col("id").asc).limit(shortlist)
            .select(col("id")).as[Long].collect()
          val ids = corpus.filter(col("id").isin(short: _*))
            .withColumn("d", Knn.l2sq(col("v"), typedLit(qv)))
            .orderBy(col("d").asc, col("id").asc).limit(10)
            .select(col("id")).as[Long].collect().toSet
          (ids intersect exactTop(i)).size / 10.0
        }
        println(f"XS_ADC_RECALL|mode=$tag|nprobe=$w|recall10=" +
          f"${recalls.sum / recalls.length}%.3f")
      }
      runAdc("single", singleC)
      runAdc("multi", multiC)
      runAdc("soar", soarC)
    }
    spark.stop()
  }
}
