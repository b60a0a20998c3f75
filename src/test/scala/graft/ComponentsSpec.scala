package graft

import graft.ops.Components

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("d1", "d2"), "d1", "d2")
      .as[(Long, Long)].collect().toMap

  test("chain, cycle-closure, and disjoint components get min-id labels") {
    // {1,2,3,8,9} joined through 9-1, plus separate {5,6}
    val out = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("long chain converges (diameter > 2 rounds of propagation)") {
    val chain = (1L to 12L).sliding(2).map(s => (s.head, s.last)).toSeq
    val out = cc(chain)
    assert(out.values.toSet == Set(1L))
    assert(out.keySet == (1L to 12L).toSet)
  }

  test("self-loops and duplicate edges are harmless") {
    val out = cc(Seq((4L, 4L), (4L, 7L), (7L, 4L), (4L, 7L)))
    assert(out == Map(4L -> 4L, 7L -> 4L))
  }

  test("edge persist is released even when a propagation job throws") {
    import org.apache.spark.sql.functions._
    val before = spark.sparkContext.getPersistentRDDs.size
    val boom = udf((i: Long) => {
      if (i > 0L) throw new RuntimeException("boom"); i
    })
    val edges = Seq((1L, 2L)).toDF("d1", "d2").withColumn("d1", boom(col("d1")))
    intercept[Exception] { Components.connectedComponents(edges, "d1", "d2") }
    // the edge frame's persist must not be stranded by the thrown job
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "connectedComponents stranded its edge persist on the failure path")
  }
}
