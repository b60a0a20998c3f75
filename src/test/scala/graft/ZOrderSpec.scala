package graft

import org.apache.spark.sql.functions._

import graft.lake.{VersionedTable, ZOrder}

/** Z-order layout + stats skipping: bucket ranks interleave into a morton
  * value, z-partitioned tables prune on EITHER clustered column, and the
  * pruned read always equals the plain filter.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // a 40×40 grid: two independent uniform dimensions
  private def grid = (0 until 1600).map(i => (i, i % 40, i / 40))
    .toDF("id", "x", "y")

  test("zb interleaves bucket bits of every column") {
    val z = ZOrder.withZBucket(grid, Seq("x", "y"), bitsPerCol = 2)
    // 2 cols × 2 bits → zb ∈ [0, 16); all 16 cells hit on a uniform grid
    val zs = z.select("zb").distinct().as[Int].collect().toSet
    assert(zs == (0 until 16).toSet)
    // corner points: low x + low y → 0; high x + high y → 15
    val corners = z.filter(col("id").isin(0, 1599)).select("id", "zb")
      .as[(Int, Int)].collect().toMap
    assert(corners(0) == 0 && corners(1599) == 15)
  }

  test("a z-partitioned table prunes on either dimension; results match the plain filter") {
    val t = VersionedTable(spark, tmpDir("vt") + "/t", Seq("id"), Seq("zb"),
      statsCols = Seq("x", "y"))
    t.merge(ZOrder.withZBucket(grid, Seq("x", "y"), bitsPerCol = 2))
    val all = t.read.select("id", "x", "y").as[(Int, Int, Int)].collect().toSet

    val byX = t.readWhere(col("x") < 5).select("id", "x", "y")
      .as[(Int, Int, Int)].collect().toSet
    assert(byX == all.filter(_._2 < 5))
    val xDirs = t.lastScanDirs
    val byY = t.readWhere(col("y") >= 35).select("id", "x", "y")
      .as[(Int, Int, Int)].collect().toSet
    assert(byY == all.filter(_._3 >= 35))
    val yDirs = t.lastScanDirs
    // each predicate hits one bucket rank of its dimension → 4 of 16 dirs
    assert(xDirs <= 6 && yDirs <= 6, s"x=$xDirs y=$yDirs of 16")

    val both = t.readWhere(col("x") < 5 && col("y") >= 35)
    assert(both.count() == all.count(r => r._2 < 5 && r._3 >= 35))
    assert(t.lastScanDirs <= 2, s"conjunction scanned ${t.lastScanDirs}")
  }
}
