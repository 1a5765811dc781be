package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional range locality for
  * the two-predicate scans a 100 TB event/corpus store serves constantly
  * (user × time, source × length, key × version). Partitioning or
  * sorting on ONE column makes range queries on the OTHER a full scan;
  * interleaving the bits of both puts rows close in (x, y) close in one
  * linear key, so a rectangle query touches a bounded set of coarse
  * z-cells instead of the whole table.
  *
  * [[zValue]] is a pure codegen'd column expression (2·bits shift/mask
  * terms, no UDF); [[writeZOrdered]] partitions storage by the COARSE
  * cell (x, y truncated by `cellShift` before interleaving) so the cell
  * count — and thus directory fan-out — is controlled independently of
  * the key resolution; [[readZRect]] enumerates the covering cells of a
  * rectangle driver-side ((x-range cells) × (y-range cells) ids — the
  * prefix-grid cover, no BIGMIN machinery needed at cell granularity)
  * and turns them into an IN-list PartitionFilter, so un-covered cells
  * are never listed or opened — the same plan-time pruning contract as
  * the IVF index (q50) and the lexical index (q89), pointed at
  * multi-dimensional predicates.
  *
  * Callers guarantee 0 <= x, y < 2^bits: higher bits are IGNORED by the
  * interleave (aliasing distant values into the same cell — harmless
  * for correctness if the exact predicate is re-applied, fatal for
  * locality). LayoutSpec pins expression/driver parity, the pruned
  * partition count, and full-scan result equality. */
object Layout {

  /** Morton interleave of the low `bits` bits of x (even positions) and
    * y (odd positions): fits in a non-negative Long for bits <= 31. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"zValue: need 1 <= bits <= 31, got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Driver-side mirror of [[zValue]] (cell enumeration, tests). */
  def zValueScala(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  /** Write `df` partitioned by the coarse z-cell of (xCol >> cellShift,
    * yCol >> cellShift) — one directory per occupied cell. */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
      bits: Int, cellShift: Int): Unit =
    df.withColumn("zcell",
        zValue(shiftright(col(xCol), cellShift),
          shiftright(col(yCol), cellShift), bits))
      .write.mode("overwrite").partitionBy("zcell").parquet(dir)

  /** Rectangle read over a [[writeZOrdered]] layout: prune to the
    * covering cells at PLAN time, then re-apply the exact predicate. */
  def readZRect(spark: SparkSession, dir: String, xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Long, yHi: Long,
      bits: Int, cellShift: Int): DataFrame = {
    val cells = for {
      xc <- (xLo >> cellShift) to (xHi >> cellShift)
      yc <- (yLo >> cellShift) to (yHi >> cellShift)
    } yield zValueScala(xc, yc, bits)
    spark.read.parquet(dir)
      .filter(col("zcell").isin(cells: _*))
      .filter(col(xCol).between(xLo, xHi) && col(yCol).between(yLo, yHi))
  }
}
