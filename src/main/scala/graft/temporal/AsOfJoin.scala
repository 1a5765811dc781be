package graft.temporal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the single right row with the
  * largest right-time ≤ left-time for the same key — the point-in-time
  * primitive training pipelines need (feature snapshots without leakage).
  * Spark has no built-in as-of join; the scalable shape is NOT a range
  * join but union + one window pass:
  *
  *   tag sides → union → window `last(right_struct, ignoreNulls)` ordered
  *   by (time, side) per key → keep left rows.
  *
  * ONE shuffle on the key, linear in |L|+|R|, no per-row range probing —
  * the same trade pandas' merge_asof and DuckDB's ASOF JOIN make, executed
  * as a Spark window. Right rows must be unique per (key, time); ties on
  * equal time resolve to the right row (at-or-before is inclusive).
  */
object AsOfJoin {

  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    // the union frame only carries our own five columns (the originals are
    // packed inside structs), so temp names just need to avoid each other —
    // but prefix-guard anyway so a pathological struct-field name can't
    // alias them
    var p = "__asof"
    while ((lCols ++ rCols).exists(_.startsWith(p))) p += "_"
    val (kC, tC, sideC, lC, rC, mC) =
      (s"${p}_k", s"${p}_t", s"${p}_side", s"${p}_l", s"${p}_r", s"${p}_m")
    // keys stay their native type: the window partitions on any orderable
    // type, and a cast here would silently null out e.g. string keys
    // (non-ANSI cast) and collapse every row into one null partition
    val l = left.select(
      col(leftKey).as(kC),
      col(leftTime).as(tC),
      lit(1).as(sideC),
      struct(lCols.map(col): _*).as(lC),
      lit(null).cast(right.select(struct(rCols.map(col): _*)).schema.head.dataType)
        .as(rC))
    val r = right.select(
      col(rightKey).as(kC),
      col(rightTime).as(tC),
      lit(0).as(sideC), // right sorts before left at equal time → inclusive
      lit(null).cast(left.select(struct(lCols.map(col): _*)).schema.head.dataType)
        .as(lC),
      struct(rCols.map(col): _*).as(rC))
    val w = Window.partitionBy(col(kC))
      .orderBy(col(tC).asc, col(sideC).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = l.unionByName(r)
      .withColumn(mC, last(col(rC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
    val lOut = lCols.map(c => col(s"$lC.$c").as(c))
    val rOut = rCols.map(c => col(s"$mC.$c").as(c))
    picked.select(lOut ++ rOut: _*)
  }
}
