package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[Layout]] z-order: column expression ≡ driver mirror, rectangle
  * reads prune to exactly the covering cells at plan time, and the
  * pruned read returns precisely the full-scan rectangle.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue column expression matches the driver mirror bit-for-bit") {
    val pts = (0 until 500).map { i =>
      ((i * 2654435761L) % 1024, (i * 40503L) % 1024)
    }.toDF("x", "y")
    val got = pts.select($"x", $"y",
        Layout.zValue($"x", $"y", bits = 10).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == Layout.zValueScala(r.getLong(0), r.getLong(1), 10))
    }
    // interleave is a bijection on the 10-bit grid: no collisions
    val distinctZ = got.map(_.getLong(2)).distinct.length
    assert(distinctZ == got.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
  }

  test("rectangle read prunes to the covering cells and equals the full scan") {
    val dir = Files.createTempDirectory("zorder").toString + "/t"
    // 64×64 grid of points, cells of 16×16 (cellShift 4) → 16 cells
    val pts = (for { x <- 0L until 64L; y <- 0L until 64L }
      yield (x * 64 + y, x, y)).toDF("id", "x", "y")
    Layout.writeZOrdered(pts, dir, "x", "y", bits = 6, cellShift = 4)
    // rectangle spanning 2×3 coarse cells
    val res = Layout.readZRect(spark, dir, "x", "y",
      xLo = 10, xHi = 20, yLo = 5, yHi = 40, bits = 6, cellShift = 4)
    val scan = res.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metadata("PartitionFilters").contains("zcell"),
      scan.metadata("PartitionFilters"))
    assert(scan.selectedPartitions.partitionCount == 2 * 3,
      s"read ${scan.selectedPartitions.partitionCount} cells, want 6")
    val expected = pts
      .filter($"x".between(10, 20) && $"y".between(5, 40))
      .select($"id").as[Long].collect().toSet
    val got = res.select($"id").as[Long].collect().toSet
    assert(got == expected)
  }
}
