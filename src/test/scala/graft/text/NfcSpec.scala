package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The codegen'd [[NfcNormalize]] expression: canonical composition
  * matching `java.text.Normalizer` (and therefore DuckDB's
  * `nfc_normalize` — q113 gates the cross-engine agreement). */
class NfcSpec extends SparkTestBase {
  import spark.implicits._

  private val decomposed = "café"   // e + combining acute
  private val composed = "café"      // precomposed é

  test("decomposed sequences compose; composed/ASCII text is unchanged") {
    val rows = Seq(
      decomposed,
      composed,
      "plain ascii",
      "",
      "Å",                 // A + ring -> Å
      "x́́",           // stacked marks still normalize
      null
    ).toDF("t")
      .select($"t", graft.functions.nfc_normalize($"t").as("n"))
      .collect()
    val got = rows.map(r => Option(r.getString(1)))
    assert(got(0).contains(composed))
    assert(got(1).contains(composed))
    assert(got(2).contains("plain ascii"))
    assert(got(3).contains(""))
    assert(got(4).contains("Å"))
    assert(got(5).contains(
      java.text.Normalizer.normalize("x́́",
        java.text.Normalizer.Form.NFC)))
    assert(got(6).isEmpty) // null in, null out
  }

  test("normalization makes decomposed duplicates collide on every dedup digest") {
    val df = Seq((1L, s"the $decomposed menu"), (2L, s"the $composed menu"))
      .toDF("id", "t")
      .withColumn("n", graft.functions.nfc_normalize($"t"))
    // raw forms hash apart; normalized forms hash together
    val raw = df.select(graft.functions.poly_hash($"t")).as[Long].collect()
    val norm = df.select(graft.functions.poly_hash($"n")).as[Long].collect()
    assert(raw(0) != raw(1))
    assert(norm(0) == norm(1))
  }

  test("SQL registration + codegen/interpreted agreement on the corpus") {
    graft.functions.registerAll(spark)
    val d = table("documents").limit(100)
      .select($"doc_id", concat($"text", lit(" " + decomposed)).as("t"))
    d.createOrReplaceTempView("nfc_in")
    val viaSql = spark.sql(
      "SELECT doc_id, nfc_normalize(t) AS n FROM nfc_in ORDER BY doc_id")
      .as[(Long, String)].collect()
    val viaCol = d.select($"doc_id", graft.functions.nfc_normalize($"t"))
      .orderBy($"doc_id").as[(Long, String)].collect()
    assert(viaSql.sameElements(viaCol))
    assert(viaSql.forall(_._2.endsWith(" " + composed)))
  }
}
