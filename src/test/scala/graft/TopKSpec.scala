package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random scores, including exact ties
  private lazy val df = (1 to 500).map { i =>
    (i % 7L, i.toLong, (i * 37 % 101) / 100.0)
  }.toDF("grp", "id", "score")

  test("aggregator top-k equals window row_number top-k, ties broken by id") {
    val topk = udaf(new TopK.TopKAgg(3))
    val viaAgg = df.groupBy("grp")
      .agg(topk(col("id"), col("score")).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), col("col.id").as("id"), col("col.score").as("score"),
        (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 3)
      .select("grp", "id", "score", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    assert(viaAgg == viaWindow && viaAgg.size == 21)
  }

  test("groups smaller than k return all their rows in order") {
    val topk = udaf(new TopK.TopKAgg(10))
    val tiny = Seq((1L, 1L, 0.5), (1L, 2L, 0.9)).toDF("grp", "id", "score")
    val out = tiny.groupBy("grp")
      .agg(topk(col("id"), col("score")).as("top"))
      .select(explode(col("top"))).select("col.id")
      .as[Long].collect().toSeq
    assert(out == Seq(2L, 1L))
  }
}
