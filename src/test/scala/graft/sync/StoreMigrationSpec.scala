package graft.sync

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[HighlightStore.migrate]]/[[HighlightStore.addColumn]] — the schema
  * evolution story over versioned store dirs: a migration lands as a NEW
  * version behind the pointer swap, old readers keep their resolved
  * version, at-rest fp16 layout passes through untouched, and a
  * migration can re-layout (partitionBy) in the same commit.
  */
class StoreMigrationSpec extends SparkTestBase {
  import spark.implicits._

  private def freshStore(dir: String): Unit = {
    val docs = Seq(
      (1L, "alpha text", Seq(1f, 0f, 0f, 0f)),
      (2L, "bravo text", Seq(0f, 1f, 0f, 0f)),
      (3L, "charlie text", Seq(0f, 0f, 1f, 0f)))
      .toDF("id", "text", "embedding")
    HighlightStore.writeAtomic(docs, dir)
  }

  private def currentVersion(dir: String): String =
    Files.readString(java.nio.file.Paths.get(dir, "CURRENT")).trim

  test("readVersion: time travel to the retained predecessor, anchored at CURRENT") {
    val dir = Files.createTempDirectory("ttstore").toString
    freshStore(dir)
    val gen1 = HighlightStore.read(spark, dir).get
      .select($"id", $"text").collect().toSet
    // second generation: one row edited, one added
    HighlightStore.writeAtomic(
      Seq((1L, "alpha EDITED", Seq(1f, 0f, 0f, 0f)),
        (2L, "bravo text", Seq(0f, 1f, 0f, 0f)),
        (3L, "charlie text", Seq(0f, 0f, 1f, 0f)),
        (4L, "delta text", Seq(0f, 0f, 0f, 1f)))
        .toDF("id", "text", "embedding"), dir)
    // steps 0 == live read; step 1 == the pre-edit generation, intact
    assert(HighlightStore.readVersion(spark, dir, 0).get
      .select($"id", $"text").collect().toSet ==
      HighlightStore.read(spark, dir).get
        .select($"id", $"text").collect().toSet)
    val back = HighlightStore.readVersion(spark, dir, 1).get
      .select($"id", $"text").collect().toSet
    assert(back == gen1)
    // the diff between generations is derivable from history alone
    val delta = graft.text.CorpusPrep.snapshotDiff(
      HighlightStore.readVersion(spark, dir, 1).get.select($"id", $"text"),
      HighlightStore.readVersion(spark, dir, 0).get.select($"id", $"text"),
      "text", "id").collect()
    assert(delta.length == 2) // the edit + the addition
    // beyond retention (keeps 2) there is no history
    assert(HighlightStore.readVersion(spark, dir, 2).isEmpty)
    // a crash-orphan version NEWER than CURRENT is not history: plant one
    val orphan = java.nio.file.Paths.get(dir, f"v-${Long.MaxValue}%019d")
    Files.createDirectory(orphan)
    try {
      val live = HighlightStore.readVersion(spark, dir, 0).get
        .select($"id").as[Long].collect().toSet
      assert(live == Set(1L, 2L, 3L, 4L), "orphan version served as live")
    } finally Files.delete(orphan)
  }

  test("addColumn backfills every row behind a pointer swap; old readers unaffected") {
    val dir = Files.createTempDirectory("store-mig").toString
    freshStore(dir)
    val v1 = currentVersion(dir)
    // a reader that resolved the pointer BEFORE the migration: it must
    // keep serving the legacy schema until it re-reads (lazy scans run
    // against the old version dir, which retention keeps)
    val oldReader = HighlightStore.read(spark, dir).get
    assert(!oldReader.columns.contains("lang"))

    assert(HighlightStore.addColumn(spark, dir, "lang", lit("en")))
    val v2 = currentVersion(dir)
    assert(v1 != v2, "migration must commit a NEW version")
    // old reader still scans the old version cleanly after the swap
    assert(oldReader.count() == 3 && !oldReader.columns.contains("lang"))
    assert(new java.io.File(s"$dir/$v1").isDirectory, "grace version deleted")

    // new readers see the column, backfilled on every existing row
    val migrated = HighlightStore.read(spark, dir).get
    assert(migrated.columns.contains("lang"))
    assert(migrated.filter($"lang" === "en").count() == 3)
    // existing data intact
    assert(migrated.select("id", "text").collect().map(r =>
      (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha text"), (2L, "bravo text"), (3L, "charlie text")))

    // re-running the same add is a naming collision, not a silent no-op
    val ex = intercept[IllegalArgumentException] {
      HighlightStore.addColumn(spark, dir, "lang", lit("en"))
    }
    assert(ex.getMessage.contains("already exists"))
  }

  test("computed backfill + re-layout in one migration; migrate on empty dir is false") {
    val dir = Files.createTempDirectory("store-mig2").toString
    freshStore(dir)
    // backfill from existing columns AND partition the new version by it
    assert(HighlightStore.migrate(spark, dir,
      df => df.withColumn("bucket",
        (col("id") % 2).cast("string")),
      partitionBy = Seq("bucket")))
    val migrated = HighlightStore.read(spark, dir).get
    assert(migrated.filter($"bucket" === "1").count() == 2)
    // hive layout exists inside the new version
    val v = currentVersion(dir)
    assert(new java.io.File(s"$dir/$v").listFiles()
      .exists(_.getName.startsWith("bucket=")))
    // no store → no migration
    assert(!HighlightStore.migrate(spark,
      Files.createTempDirectory("store-mig-none").toString + "/nope",
      identity[org.apache.spark.sql.DataFrame]))
  }

  test("tombstoneScopes: a tombstone masks only earlier segments") {
    // build s1 s2 | del d1 | append s3 | del d2 | append s4
    val scopes = SegmentedIndex.tombstoneScopes(
      Seq("seg-1", "seg-2", "del-3", "seg-4", "del-5", "seg-6"))
    assert(scopes == Seq(
      (Seq("seg-1", "seg-2"), Seq("del-3", "del-5")),
      (Seq("seg-4"), Seq("del-5")),
      (Seq("seg-6"), Nil)))
    // steady state: one run, no tombstones, no anti-join
    assert(SegmentedIndex.tombstoneScopes(Seq("seg-1", "seg-2"))
      == Seq((Seq("seg-1", "seg-2"), Nil)))
    // leading tombstone (everything before it already compacted away)
    assert(SegmentedIndex.tombstoneScopes(Seq("del-1", "seg-2"))
      == Seq((Seq("seg-2"), Nil)))
  }

  test("deleteWhere removes matching rows behind the pointer swap; null cond keeps") {
    val dir = Files.createTempDirectory("store-del").toString
    val docs = Seq(
      (1L, "keep me", Some("en")),
      (2L, "delete me", Some("xx")),
      (3L, "null lang", Option.empty[String]))
      .toDF("id", "text", "lang")
    HighlightStore.writeAtomic(docs, dir)
    assert(HighlightStore.deleteWhere(spark, dir, $"lang" === "xx"))
    val left = HighlightStore.read(spark, dir).get
      .select("id").as[Long].collect().toSet
    // row 3's condition is NULL → kept, SQL DELETE WHERE semantics
    assert(left == Set(1L, 3L))
    // no store → false, not a crash
    assert(!HighlightStore.deleteWhere(spark,
      Files.createTempDirectory("store-del-none").toString + "/nope",
      $"lang" === "xx"))
  }

  test("fp16 store migrates without widening: emb16 stays at rest, reads still decode") {
    val dir = Files.createTempDirectory("store-mig16").toString
    val docs = Seq(
      (1L, "alpha", Seq(0.5f, 0.25f)),
      (2L, "bravo", Seq(1f, 2f))).toDF("id", "text", "embedding")
    HighlightStore.writeAtomic(docs, dir, fp16 = true)
    assert(HighlightStore.addColumn(spark, dir, "source_type", lit("book")))
    // at rest: the migrated version still stores the BINARY blob, no
    // fp32 embedding column materialized by the migration
    val raw = spark.read.parquet(s"$dir/${currentVersion(dir)}")
    assert(raw.columns.contains("emb16") && !raw.columns.contains("embedding"))
    // through read(): transparent decode + the new column
    val read = HighlightStore.read(spark, dir).get
    assert(read.columns.contains("embedding") && read.columns.contains("source_type"))
    assert(read.filter($"source_type" === "book").count() == 2)
  }
}
