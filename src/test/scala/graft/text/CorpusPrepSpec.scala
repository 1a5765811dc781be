package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup

class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  test("scrubPii masks email, SSN-shaped id, and phone independently") {
    val rows = Seq(
      "mail bob.smith+x@corp.example.org now",
      "id 123-45-6789 phone 555-123-4567",
      "no pii here at all",
      "almost 12-345-6789 and 1234-56-7890x",
      "Mixed John.Doe@Example.COM case")
      .toDF("text")
      .select(CorpusPrep.scrubPii($"text").as("out"))
      .as[String].collect()
    assert(rows(0) == "mail <EMAIL> now")
    assert(rows(1) == "id <ID> phone <PHONE>")
    assert(rows(2) == "no pii here at all")
    assert(rows(4) == "Mixed <EMAIL> case")
    // 12-345-6789 is neither shape; 234-56-7890 inside the last token IS
    // id-shaped (digit boundaries are not asserted — scrubbing is
    // deliberately aggressive)
    assert(rows(3) == "almost 12-345-6789 and 1<ID>x")
  }

  test("sampleByContentHash: deterministic, content-keyed, ~keep/buckets") {
    val docs = (0 until 400).map(i => (i.toLong, s"document body number $i"))
      .toDF("doc_id", "text")
    val s1 = CorpusPrep.sampleByContentHash(docs, "text", 10, 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val s2 = CorpusPrep.sampleByContentHash(docs, "text", 10, 2)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 == s2, "same corpus must select the same subset")
    assert(s1.size > 40 && s1.size < 120, s"~20% of 400 expected, got ${s1.size}")
    // content-keyed: reassigning ids selects the SAME documents
    val renumbered = docs.select(($"doc_id" + 1000).as("doc_id"), $"text")
    val s3 = CorpusPrep.sampleByContentHash(renumbered, "text", 10, 2)
      .select("doc_id").as[Long].collect().map(_ - 1000).sorted.toSeq
    assert(s3 == s1, "sampling must follow content, not ids")
    // keep=0 empty, keep=buckets everything
    assert(CorpusPrep.sampleByContentHash(docs, "text", 10, 0).isEmpty)
    assert(CorpusPrep.sampleByContentHash(docs, "text", 10, 10).count() == 400)
  }

  test("mixtureSample: per-source rates apply; kept sets nest as rates rise") {
    val docs = table("documents").select($"doc_id", $"text", $"source")
    def ids(rate: Int) = CorpusPrep.mixtureSample(docs, "text", "source",
        rates = Map("src0" -> rate), defaultKeep = 3, buckets = 10)
      .filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    val (low, high) = (ids(2), ids(6))
    assert(low.subsetOf(high), "raising a source's rate churned its kept set")
    assert(ids(0).isEmpty && ids(10).size ==
      docs.filter($"source" === "src0").count())
    // unlisted sources follow the default rate independent of src0's rate
    def others(rate: Int) = CorpusPrep.mixtureSample(docs, "text", "source",
        rates = Map("src0" -> rate), defaultKeep = 3, buckets = 10)
      .filter($"source" =!= "src0").count()
    assert(others(0) == others(10))
  }

  test("mixtureResample: epochs stack full copies + nested fractional remainder") {
    val docs = table("documents").select($"doc_id", $"text", $"source")
    val src0 = docs.filter($"source" === "src0")
    val n0 = src0.count()
    def copies(rate: Int): Map[Long, Long] =
      CorpusPrep.mixtureResample(docs, "text", "source",
          rates = Map("src0" -> rate), defaultRate = 3, buckets = 10,
          maxEpochs = 4)
        .filter($"source" === "src0")
        .groupBy($"doc_id").count()
        .as[(Long, Long)].collect().toMap
    // rate = k*buckets → exactly k copies of every document, epochs 0..k-1
    assert(copies(20).values.toSet == Set(2L))
    // per-document copy count is monotone in the rate (nesting extends
    // from kept-sets to copy-counts across the epoch boundary)
    val at12 = copies(12).withDefaultValue(0L)
    val at17 = copies(17).withDefaultValue(0L)
    assert(src0.select("doc_id").as[Long].collect()
      .forall(id => at12(id) <= at17(id)))
    // the fractional part selects the same documents mixtureSample keeps:
    // rate 12 = 1 full epoch + the rate-2 downsample riding epoch 1
    val frac12 = at12.filter(_._2 == 2L).keySet
    val kept2 = CorpusPrep.mixtureSample(docs, "text", "source",
        rates = Map("src0" -> 2), defaultKeep = 3, buckets = 10)
      .filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    assert(frac12 == kept2)
    // remainder rides the LAST epoch: epoch ids for a 2-copy doc are {0, 1}
    val epochs = CorpusPrep.mixtureResample(docs, "text", "source",
        rates = Map("src0" -> 12), defaultRate = 3, buckets = 10,
        maxEpochs = 4)
      .filter($"source" === "src0")
      .groupBy($"doc_id").agg(collect_set($"epoch").as("es"))
      .as[(Long, Seq[Int])].collect()
    assert(epochs.forall { case (_, es) => es.sorted == (0 until es.size) })
    // repetition cap refuses, loudly, instead of clamping
    assertThrows[IllegalArgumentException] {
      CorpusPrep.mixtureResample(docs, "text", "source",
        rates = Map("src0" -> 41), defaultRate = 3, buckets = 10,
        maxEpochs = 4)
    }
    // rates <= buckets degenerate to mixtureSample exactly
    val down = CorpusPrep.mixtureResample(docs, "text", "source",
        rates = Map("src0" -> 2), defaultRate = 0, buckets = 10,
        maxEpochs = 4)
      .filter($"source" === "src0").select("doc_id").as[Long].collect().toSet
    assert(down == kept2)
    assert(n0 > 0)
  }

  test("trimByLength: approx sibling matches exact within the sketch bound; no full buffer") {
    val docs = table("documents").select($"source", $"n_chars")
    val exact = CorpusPrep.trimByLength(docs, "n_chars", 0.05, 0.95)
    val approx = CorpusPrep.trimByLength(docs, "n_chars", 0.05, 0.95,
      approx = true)
    // at accuracy 10^4 over a fixture-sized corpus the sketch retains
    // every value — cutoffs (and therefore the kept set) coincide
    assert(approx.count() == exact.count())
    // a deliberately coarse sketch still lands within its rank-error
    // bound: kept-count divergence ≤ 2 * n / accuracy (lo and hi each
    // off by at most n/accuracy ranks)
    val n = docs.count()
    val coarse = CorpusPrep.trimByLength(docs, "n_chars", 0.05, 0.95,
      approx = true, accuracy = 100).count()
    assert(math.abs(coarse - exact.count()) <= 2 * n / 100 + 1)
    // the plan aggregates through the bounded sketch, not the
    // buffer-everything exact percentile
    val plan = approx.queryExecution.executedPlan.toString
    assert(plan.contains("percentile_approx"), "approx form missing sketch aggregate")
    assert(!plan.contains("percentile(") || plan.contains("percentile_approx"),
      "approx form fell back to exact percentile")
    assert(exact.queryExecution.executedPlan.toString.contains("percentile"))
    // the per-GROUP shape (q45's) behaves the same: sketch == exact at
    // fixture cardinality per group
    val exactMed = docs.groupBy($"source")
      .agg(percentile($"n_chars", lit(0.5)).as("m"))
      .orderBy($"source").as[(String, Double)].collect().toSeq
    val approxMed = docs.groupBy($"source")
      .agg(percentile_approx($"n_chars", lit(0.5), lit(10000))
        .cast("double").as("m"))
      .orderBy($"source").as[(String, Double)].collect().toSeq
    exactMed.zip(approxMed).foreach { case ((s1, m1), (s2, m2)) =>
      assert(s1 == s2)
      // percentile interpolates between ranks, the sketch returns a
      // retained VALUE — agreement is within one inter-value gap
      assert(math.abs(m1 - m2) <= math.max(1.0, m1 * 0.05), s"$s1: $m1 vs $m2")
    }
  }

  test("chunkWords: chunks tile the document; de-overlapped concat reconstructs it") {
    val text95 = (1 to 95).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text95), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val out = CorpusPrep.chunkWords(df, "text", "doc_id",
        chunkWords = 50, overlap = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // 95 words, step 40 → 3 chunks: [1..50], [41..90], [81..95]
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1.map(_._4).toSeq == Seq(50L, 50L, 15L))
    assert(doc1(1)._3.startsWith("w41 ") && doc1(2)._3.endsWith(" w95"))
    // de-overlapped concatenation reconstructs the document exactly
    val rebuilt = doc1.head._3.split(" ") ++
      doc1.tail.flatMap(_._3.split(" ").drop(10))
    assert(rebuilt.mkString(" ") == text95)
    // short and empty docs yield exactly one (possibly short) chunk
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2L)))
    assert(out.filter(_._1 == 3L).map(t => (t._2, t._4)).toSeq == Seq((0, 1L)))
  }

  test("packTokenStream: two-level prefix sum equals the naive global cumsum") {
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until (i % 17) + 1).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = CorpusPrep.packTokenStream(docs, "text", "doc_id",
        windowTokens = 64, bucketWidth = 32)
      .orderBy($"id")
      .select($"id", $"n_tokens", $"tokens_before", $"shard_start",
        $"shard_end", $"offset_in_shard")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    // naive single-threaded reference: running sum in id order
    var running = 0L
    out.foreach { case (id, n, before, ss, se, off) =>
      assert(before == running, s"doc $id: tokens_before $before != $running")
      assert(ss == before / 64 && se == (before + n - 1) / 64 && off == before % 64)
      running += n
    }
    // bucket width is a layout dial, not a semantic one
    val wide = CorpusPrep.packTokenStream(docs, "text", "doc_id",
        windowTokens = 64, bucketWidth = 1 << 20)
      .orderBy($"id").collect()
    assert(wide.toSeq == CorpusPrep.packTokenStream(docs, "text", "doc_id",
      windowTokens = 64, bucketWidth = 32).orderBy($"id").collect().toSeq)
  }

  test("temperatureMixture: alpha=1 is proportional; alpha<1 boosts small sources; kept sets nest") {
    val docs = (0 until 800).map { i =>
      val src = if (i % 8 == 0) "small" else "big" // 100 vs 700 docs
      // texts must differ in MORE than a trailing digit: a radix-31
      // polynomial hash maps near-identical suffixes to adjacent values
      // mod ppm buckets, which would cluster the keep rule (real corpora
      // differ broadly; 800 docs differing in 3 chars do not)
      (i.toLong, src, s"body ${(i * 2654435761L) % 999983} tail $i")
    }.toDF("doc_id", "source", "text")
    // alpha=1: temperature off — every source keeps ~targetFrac
    val r1 = CorpusPrep.ratesBySource(docs, "source", alpha = 1.0,
      targetFrac = 0.5).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r1("small") == 500000 && r1("big") == 500000, r1.toString)
    // alpha=0.5: the small source's rate strictly exceeds the big one's
    val rHalf = CorpusPrep.ratesBySource(docs, "source", alpha = 0.5,
      targetFrac = 0.5).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rHalf("small") > rHalf("big"), rHalf.toString)
    // kept sets nest as targetFrac rises (same content-hash rule)
    val keptLo = CorpusPrep.temperatureMixture(docs, "text", "source",
      alpha = 0.5, targetFrac = 0.3).select($"doc_id").as[Long].collect().toSet
    val keptHi = CorpusPrep.temperatureMixture(docs, "text", "source",
      alpha = 0.5, targetFrac = 0.6).select($"doc_id").as[Long].collect().toSet
    assert(keptLo.subsetOf(keptHi),
      s"${(keptLo -- keptHi).size} docs churned between targetFrac 0.3 and 0.6")
    // expected volume: within a few percent of targetFrac when nothing clips
    assert(math.abs(keptHi.size - 480) < 60, s"kept ${keptHi.size}, want ~480")
  }

  test("dsirWeights/dsirSelect: target-like docs outscore off-domain; selection is deterministic") {
    // target domain: cooking phrases; raw = 10 target-like + 10 code-like
    // docs, phrases repeated so the logw gap dwarfs Gumbel noise (scale
    // 1) and the selection must be exactly the target-like half
    val cook = "stir the onion butter sauce simmer garlic pepper salt slow"
    val code = "compile the linker stack heap pointer thread mutex lock fast"
    val raw = ((0L until 10L).map(i => (i, s"$cook $cook $cook doc$i")) ++
      (10L until 20L).map(i => (i, s"$code $code $code doc$i")))
      .toDF("doc_id", "text")
    val target = Seq.tabulate(3)(i => s"$cook seed$i").toDF("t")
    val w = graft.text.CorpusPrep.dsirWeights(raw, "text", "doc_id",
      target, "t", buckets = 1024)
    val byId = w.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId.size == 20)
    val worstCook = (0L until 10L).map(byId).min
    val bestCode = (10L until 20L).map(byId).max
    assert(worstCook > bestCode,
      s"cooking floor $worstCook vs code ceiling $bestCode")
    // partition-order determinism: the DECIMAL accumulation makes logw
    // bit-stable under repartition
    val w7 = graft.text.CorpusPrep.dsirWeights(raw.repartition(7), "text",
      "doc_id", target, "t", buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w7 == byId)
    // selection keeps exactly the target-like half; a doc with no
    // bigram carries no evidence and never surfaces
    val single = raw.unionByName(Seq((99L, "loneword")).toDF("doc_id", "text"))
    val picked = graft.text.CorpusPrep.dsirSelect(single, "text", "doc_id",
      target, "t", k = 10, buckets = 1024)
      .collect().map(_.getLong(0)).toSet
    assert(picked == (0L until 10L).toSet, picked.toString)
  }

  test("crossCorpusPairs: only cross-side pairs, never corpus- or bench-internal") {
    // two identical docs INSIDE the corpus (internal dup must not appear),
    // one of them duplicated into the bench side
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "completely different text body here")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "unrelated benchmark probe text")).toDF("doc_id", "text")
    val got = Dedup.crossCorpusPairs(corpus, bench, "text", "doc_id", 0.5)
      .select("corpus_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L)),
      s"expected exactly the cross-side matches, got $got")
  }

  test("snapshotDiff: added/removed/changed only — unchanged bulk never surfaces") {
    val old = Seq(
      (1L, "kept as is"), (2L, "will change"), (3L, "will be removed"))
      .toDF("doc_id", "text")
    val neu = Seq(
      (1L, "kept as is"), (2L, "has changed"), (4L, "brand new"))
      .toDF("doc_id", "text")
    val got = CorpusPrep.snapshotDiff(old, neu, "text", "doc_id")
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("takeNPerStratum: quota honored, small strata keep all, content-keyed") {
    val docs = (0 until 90).map { i =>
      val s = s"s${i % 3}"
      (i.toLong, s, s"body ${(i * 2654435761L) % 999983} tail $i")
    } :+ ((90L, "tiny", "lone doc"))
    val df = docs.toDF("doc_id", "source", "text")
    val out = CorpusPrep.takeNPerStratum(df, "text", "source", "doc_id", n = 10)
    val bySrc = out.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc == Map("s0" -> 10L, "s1" -> 10L, "s2" -> 10L, "tiny" -> 1L))
    // content-keyed: reassigning surrogate keys selects the same TEXTS
    val rekeyed = df.withColumn("doc_id", col("doc_id") + 1000)
    val a = out.select($"text").as[String].collect().toSet
    val b = CorpusPrep.takeNPerStratum(rekeyed, "text", "source", "doc_id", 10)
      .select($"text").as[String].collect().toSet
    assert(a == b)
  }

  test("exportShards: every doc lands exactly once, shard dirs on disk, manifest honest") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    try {
      val docs = (0 until 300).map(i =>
        (i.toLong, (0 to i % 17).map(j => s"w$j").mkString(" ")))
        .toDF("doc_id", "text")
      val manifest = CorpusPrep.exportShards(docs, "text", "doc_id",
        s"$dir/out", shardTokens = 100).collect()
      // the manifest sums back to the corpus: every doc exactly once
      assert(manifest.map(_.getLong(1)).sum == 300L)
      val totalTokens = docs
        .agg(sum(size(split($"text", " ")))).head().getLong(0)
      assert(manifest.map(_.getLong(2)).sum == totalTokens)
      // whole-doc sharding: each shard holds ~budget ± one document
      assert(manifest.forall(r => r.getLong(2) <= 100L + 17L))
      // shard directories really exist with data files
      val shardDirs = new java.io.File(s"$dir/out").listFiles()
        .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
      assert(shardDirs.length == manifest.length)
      // and the manifest re-derives identically from a fresh read
      val re = CorpusPrep.exportShards(docs.repartition(7), "text",
        "doc_id", s"$dir/out2", shardTokens = 100).collect()
      assert(re.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq ==
        manifest.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("exportShards: empty corpus yields the empty manifest, not a read error") {
    val dir = java.nio.file.Files.createTempDirectory("shardsempty").toString
    try {
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val m = CorpusPrep.exportShards(empty, "text", "doc_id",
        s"$dir/out", shardTokens = 100)
      assert(m.columns.toSeq ==
        Seq("shard_id", "n_docs", "shard_tokens", "digest"))
      assert(m.count() == 0)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator()
        .asScala.toSeq.reverse.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("weightedSample: quota + determinism; heavy weights dominate; w<=0 excluded") {
    // one stratum, 200 rows: 100 with weight 50, 100 with weight 1 —
    // an exponential-clock sample of 20 should be mostly heavy rows
    val docs = (0 until 200).map { i =>
      val w = if (i < 100) 50L else 1L
      (i.toLong, "all", w, s"doc ${(i * 2654435761L) % 999983} tail $i")
    } ++ Seq((900L, "all", 0L, "zero weight"), (901L, "all", -3L, "neg"))
    val df = docs.toDF("doc_id", "source", "w", "text")
    val out = CorpusPrep.weightedSample(df, "text", "w", "doc_id", "source",
      k = 20).collect()
    assert(out.length == 20)
    assert(out.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to 20))
    // non-positive weights can never be sampled
    assert(!out.exists(r => Set(900L, 901L)(r.getAs[Long]("doc_id"))))
    // weight-proportionality: P(heavy in top-20) >> P(light); with a
    // 50:1 ratio the light class gets ~0-2 of 20 slots. Deterministic
    // fixture, so this is a fixed fact, not a flaky draw
    val heavy = out.count(_.getAs[Long]("w") == 50L)
    assert(heavy >= 17, s"heavy rows sampled: $heavy of 20")
    // hash-seeded: invariant under repartitioning AND re-keying
    val re = CorpusPrep.weightedSample(df.repartition(13), "text", "w",
      "doc_id", "source", k = 20).collect()
    assert(re.map(r => (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"))).toSeq
      .sortBy(_._1) ==
      out.map(r => (r.getAs[Int]("rk"), r.getAs[Long]("doc_id"))).toSeq
      .sortBy(_._1))
  }
}
