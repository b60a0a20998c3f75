package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.LakeTable
import graft.ops.{Exprs, Q}
import Exprs._

/** Oracle-checked streaming query: two bronze file drops ingested through
  * the checkpointed stream — the second run picks up ONLY the new file and
  * its rows upsert over the first batch (§2.10 facade).
  */
object StreamOps {

  private val schema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("price", DoubleType)))

  /** Move the single CSV part-file Spark wrote in `from` into dir `to`. */
  private def dropFile(from: String, to: String, name: String): Unit = {
    val src = Files.list(Paths.get(from)).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".csv")).get
    Files.createDirectories(Paths.get(to))
    Files.move(src, Paths.get(to, name), StandardCopyOption.REPLACE_EXISTING)
  }

  val queries: Seq[Q] = Seq(
    Q("q45_stream_merge",
      (s, d) => {
        val work = Files.createTempDirectory("graft_stream").toString
        val bronze = s"$work/bronze"
        val table = LakeTable(s, s"$work/table", Seq("o_orderkey"))

        // drop 1: every 5th order at its base price
        t(s, d, "orders").filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_totalprice").as("price"))
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$work/f1")
        dropFile(s"$work/f1", bronze, "batch1.csv")
        StreamIngest.ingestAvailable(s, bronze, schema, table, s"$work/ckpt")

        // drop 2: every 10th order re-priced (+1000) — must upsert, and the
        // checkpoint must keep batch 1 from being reprocessed
        t(s, d, "orders").filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), (col("o_totalprice") + lit(1000.0)).as("price"))
          .coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$work/f2")
        dropFile(s"$work/f2", bronze, "batch2.csv")
        StreamIngest.ingestAvailable(s, bronze, schema, table, s"$work/ckpt")

        table.read.orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
          CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 5 = 0 ORDER BY o_orderkey"""))
  )
}
