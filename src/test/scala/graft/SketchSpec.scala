package graft

import org.apache.spark.sql.functions._

import graft.ops.Exprs

/** Sketch aggregates have engine-defined values (no DuckDB oracle);
  * correctness here = bounded error against the exact answers.
  */
class SketchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within HLL error bound of exact") {
    val li = Exprs.t(spark, dir, "lineitem")
    val exact = li.select(countDistinct("l_partkey")).head().getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile lands within the neighborhood of the exact median") {
    val li = Exprs.t(spark, dir, "lineitem")
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    val approx = li.select(expr("approx_percentile(l_extendedprice, 0.5, 1000)"))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("approx_percentile accuracy sweep: error shrinks as accuracy grows") {
    val li = Exprs.t(spark, dir, "lineitem")
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).head().getDouble(0)
    // relative-error ceilings per accuracy parameter (1/accuracy is the
    // rank-error bound; value error on this distribution tracks it)
    val sweep = Seq(100 -> 0.05, 1000 -> 0.02, 10000 -> 0.005)
    val errs = sweep.map { case (acc, ceiling) =>
      val approx = li.select(expr(s"approx_percentile(l_extendedprice, 0.5, $acc)"))
        .head().getDouble(0)
      val err = math.abs(approx - exact) / exact
      assert(err < ceiling, s"accuracy=$acc err=$err ceiling=$ceiling")
      err
    }
    // the highest-accuracy sketch must not be worse than the lowest's bound
    assert(errs.last <= sweep.head._2)
  }
}
