package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a training-data pipeline runs before (and
  * after) dedup: reproducible subsetting and PII scrubbing. Pure Column
  * expressions — codegen'd, no UDFs, no shuffle of their own.
  * (100-TB extension surface; the reference has no corpus-prep analog.)
  */
object CorpusPrep {

  /** Deterministic content-hash sampling: keep a document iff
    * `polyHash(text) % buckets < keep` — a reproducible `keep/buckets`
    * subset that is stable across runs, partitionings, and id
    * reassignment (the hash is over CONTENT, not the key, so re-ingesting
    * the same corpus under new ids selects the same documents). This is
    * the sampling a pipeline uses for eval splits and for training
    * sketches (e.g. IVF centroids) where `.sample()`'s RNG would not be
    * replayable. Narrow filter — pushes to the scan, no shuffle. */
  def sampleByContentHash(df: DataFrame, textCol: String,
      buckets: Int, keep: Int): DataFrame = {
    require(buckets > 0 && keep >= 0 && keep <= buckets,
      s"sampleByContentHash: need 0 <= keep <= buckets, got $keep/$buckets")
    df.filter(pmod(TextAnalysis.polyHash(col(textCol)), lit(buckets.toLong))
      < keep.toLong)
  }

  /** Scrub patterns. Kept RE2-compatible (no backtracking constructs) so
    * the same pattern text runs identically under Java regex (Spark) and
    * RE2 (DuckDB oracle) — and would under any RE2-based scan pushdown.
    * The email pattern is case-insensitive via the RE2-portable `(?i)`
    * flag (real corpora mix case; a lowercase-only class would ship
    * `John.Doe@Example.COM` through unmasked). */
  val EmailPattern = "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IdPattern    = "\\d{3}-\\d{2}-\\d{4}"   // SSN-shaped 3-2-4
  val PhonePattern = "\\d{3}-\\d{3}-\\d{4}"   // 3-3-4

  /** PII scrubbing: emails → `<EMAIL>`, SSN-shaped ids → `<ID>`,
    * phone-shaped numbers → `<PHONE>`. The 3-2-4 id pattern cannot match
    * inside a 3-3-4 phone (the middle-group widths differ), so the
    * replacement order is not load-bearing — but it is fixed, and the
    * composition is a single codegen'd expression chain per row. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        IdPattern, "<ID>"),
      PhonePattern, "<PHONE>")
}
