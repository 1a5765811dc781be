package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy self-join — the entity-resolution primitive
  * (near-identical titles, author strings, product names across noisy
  * sources). Brute force is Θ(n²) Levenshtein evaluations; this is the
  * PassJoin shape (Li, Deng, Feng 2011): segment-pigeonhole BLOCKING
  * generates a complete candidate set through one equi-join, and the
  * quadratic-time distance runs once per CANDIDATE, not per pair.
  *
  * Pigeonhole: partition an indexed string s into `k+1` contiguous
  * segments (even split). If ed(s, t) <= k, the k edits can touch at
  * most k segments, so t contains at least one segment VERBATIM — and
  * within ±k of its home position. The probe side therefore emits, for
  * every candidate indexed length `|t|+dl` (dl ∈ [-k, k]), every
  * segment slot j, and every offset w ∈ [-k, k], the substring of t
  * that segment would occupy — (2k+1)²·(k+1) bounded probes per string
  * (75 at k=2), joined to the index on (length, slot, segment-text).
  * We use the loose ±k window rather than PassJoin's tightened
  * per-slot window: a few more candidates, same completeness proof,
  * and the verify stage keeps the result exact either way.
  *
  * Scale shape: the one exchange carries (length, slot, short segment)
  * keys — never full strings; candidates are output-sensitive in the
  * number of near-matches; verification rehydrates only candidate ids
  * through two narrow equi-joins (the [[graft.dedup.Dedup]]
  * rehydration pattern). Strings shorter than k+1 chars cannot be
  * segmented and are excluded (callers pad or brute-force that tiny
  * stratum).
  *
  * Returns (id_a, id_b, dist) with id_a < id_b and dist <= maxEdits —
  * exactly the brute-force result on strings of length >= k+1. */
object FuzzyJoin {

  private def segBase(len: Column, k: Int): Column =
    ((len - pmod(len, lit(k + 1))) / lit(k + 1)).cast("int")

  /** Length of segment `j` under the even split of a `len`-char string. */
  private def segLen(len: Column, j: Int, k: Int): Column =
    segBase(len, k) + when(lit(j) < pmod(len, lit(k + 1)), 1).otherwise(0)

  /** 1-based start of segment `j`. */
  private def segPos(len: Column, j: Int, k: Int): Column =
    lit(1) + lit(j) * segBase(len, k) + least(lit(j), pmod(len, lit(k + 1)))

  /** Self-join form: unordered (id_a, id_b, dist) with id_a < id_b. */
  def editDistancePairs(df: DataFrame, textCol: String, keyCol: String,
      maxEdits: Int): DataFrame = {
    val k = maxEdits
    require(k >= 1 && k <= 4, s"editDistancePairs: need 1 <= maxEdits <= 4, got $k")
    val s = clean(df, textCol, keyCol, k)
    val cand = candidates(s, s, k)
      .filter(col("id_p") =!= col("id_i"))
      .select(least(col("id_p"), col("id_i")).as("id_a"),
        greatest(col("id_p"), col("id_i")).as("id_b"))
      .distinct()
    verify(cand, s, s, k)
  }

  /** Cross-table record linkage: ordered (id_a, id_b, dist) pairs with
    * id_a from `left` and id_b from `right` — merging two noisy catalogs
    * (titles, author strings, product names) where neither side's keys
    * align. Same complete blocking, same per-candidate verification;
    * only `right` is segment-indexed, `left` probes it. Key spaces may
    * overlap — pairs are cross-table by construction. */
  def editDistanceJoin(left: DataFrame, right: DataFrame, textCol: String,
      keyCol: String, maxEdits: Int): DataFrame = {
    val k = maxEdits
    require(k >= 1 && k <= 4, s"editDistanceJoin: need 1 <= maxEdits <= 4, got $k")
    val l = clean(left, textCol, keyCol, k)
    val r = clean(right, textCol, keyCol, k)
    val cand = candidates(l, r, k)
      .select(col("id_p").as("id_a"), col("id_i").as("id_b"))
      .distinct()
    verify(cand, l, r, k)
  }

  private def clean(df: DataFrame, textCol: String, keyCol: String,
      k: Int): DataFrame =
    df.select(col(keyCol).as("id"), col(textCol).as("t"))
      .filter(col("t").isNotNull && length(col("t")) >= k + 1)

  /** Complete candidate set: probe side `p` against segment-indexed `ix`
    * — (id_p, id_i) rows, duplicates possible (dedup at the caller). */
  private def candidates(p: DataFrame, ix: DataFrame, k: Int): DataFrame = {
    val tl = length(col("t"))
    val index = ix.select(col("id"),
        explode(array((0 to k).map { j =>
          struct(tl.as("lc"), lit(j).as("j"),
            col("t").substr(segPos(tl, j, k), segLen(tl, j, k)).as("seg"))
        }: _*)).as("e"))
      .select(col("id").as("id_i"), col("e.lc").as("lc"),
        col("e.j").as("j"), col("e.seg").as("seg"))
    // two-stage probe generation: materialize the candidate indexed
    // length (and its split parameters) once per dl BEFORE fanning out
    // (slot, offset) — a single flat (2k+1)²(k+1)-struct generator
    // re-derives every subexpression per struct and its codegen cost
    // dominated the whole join on small inputs (measured 5 s/run at 75
    // structs; ~0.5 s in this shape)
    val withLc = p.select(col("id"), col("t"),
        explode(array((-k to k).map(dl => tl + lit(dl)): _*)).as("lc"))
      .filter(col("lc") >= k + 1)
      .withColumn("__base", segBase(col("lc"), k))
      .withColumn("__rem", pmod(col("lc"), lit(k + 1)))
    val slots = for { j <- 0 to k; w <- -k to k } yield (j, w)
    val probes = withLc.select(col("id"), col("lc"),
        explode(array(slots.map { case (j, w) =>
          val l = col("__base") + when(lit(j) < col("__rem"), 1).otherwise(0)
          val pp = lit(1) + lit(j) * col("__base") +
            least(lit(j), col("__rem")) + lit(w)
          val valid = pp >= lit(1) && pp + l - 1 <= length(col("t"))
          // invalid probes null out and drop below (struct arity must be
          // uniform inside the generator array)
          struct(lit(j).as("j"),
            when(valid, col("t").substr(pp, l)).as("seg"))
        }: _*)).as("e"))
      .select(col("id").as("id_p"), col("lc"),
        col("e.j").as("j"), col("e.seg").as("seg"))
      .filter(col("seg").isNotNull)
    probes.join(index, Seq("lc", "j", "seg"))
      .select(col("id_p"), col("id_i"))
  }

  /** Rehydrate candidate (id_a, id_b) rows with their strings (id_a from
    * `a`, id_b from `b`) and keep Levenshtein <= k. */
  private def verify(cand: DataFrame, a: DataFrame, b: DataFrame,
      k: Int): DataFrame =
    cand
      .join(a.select(col("id").as("id_a"), col("t").as("__ta")), Seq("id_a"))
      .join(b.select(col("id").as("id_b"), col("t").as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).as("dist"))
      .filter(col("dist") <= k)
}
