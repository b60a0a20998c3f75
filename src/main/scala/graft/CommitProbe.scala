package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.VersionedTable

/** Commit-path profiler (round-11 performance attribution): times each
  * phase of the q117-shaped workload (overwrite → rename → merge →
  * time-travel read → current read) with per-phase Spark-job counts, and
  * drives an N-commit log-age canary asserting per-commit cost stays flat
  * as the log grows (the checkpointed-replay contract: commit cost is
  * O(checkpointInterval), never O(commits)).
  *
  * Modes (SPARK_GRAFT_PROBE): `q117` (default) | `canary`.
  * Canary length: SPARK_GRAFT_PROBE_N (default 300).
  */
object CommitProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.getOrElse("SPARK_GRAFT_PROBE", "q117") match {
      case "canary" =>
        canary(spark, sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "300").toInt)
      case "bloom" => bloomProbe(spark, sfDir)
      case _ => profileQ117(spark, sfDir)
    }
    spark.stop()
  }

  private val jobCount = new java.util.concurrent.atomic.AtomicInteger

  private def withJobCounter(spark: SparkSession): Unit =
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    })

  private def s3(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", d)

  /** Per-phase wall time + Spark-job count for the q117 workload, two
    * passes (first = warm-up), second reported. The phase boundaries are
    * exactly q117's statements, so a climb localizes to one named phase.
    */
  private def profileQ117(spark: SparkSession, sfDir: String): Unit = {
    withJobCounter(spark)
    def once(tag: String): Unit = {
      val work = graft.ops.WorkDirs.workDir("graft_probe117")
      val vt = VersionedTable(spark, s"$work/t", Seq("o_orderkey"), Seq("status"))
      val base = graft.io.Sources.table(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").as("price"),
          col("o_orderstatus").as("status"))
      val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Int)]
      def phase[T](name: String)(body: => T): T = {
        // brief settle so async listener-bus job events land in their phase
        Thread.sleep(150)
        val j0 = jobCount.get(); val t0 = System.nanoTime()
        val r = body
        Thread.sleep(150)
        phases += ((name, (System.nanoTime() - t0) / 1e9 - 0.15, jobCount.get() - j0))
        r
      }
      phase("overwrite_v1") { vt.overwrite(base) }
      phase("rename_v2") { vt.renameColumn("price", "amount") }
      phase("merge_v3") {
        vt.merge(base.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), (col("price") + 500.0).as("amount"),
            col("status")))
      }
      phase("read_v1_cols") {
        require(vt.readVersion(1).columns.contains("price"))
      }
      phase("read_final") {
        vt.read.select("o_orderkey", "amount", "status").orderBy("o_orderkey")
          .write.format("noop").mode("overwrite").save()
      }
      val total = phases.map(_._2).sum
      val detail = phases.map { case (n, s, j) =>
        s""""$n":{"sec":${s3(s)},"jobs":$j}""" }.mkString(",")
      println(s"""{"probe":"q117","pass":"$tag","total":${s3(total)},$detail}""")
    }
    once("warm-up")
    once("warm")
  }

  /** Drive `n` commits through one table — repeating cycles of append /
    * setProperties (metadata-only) / merge — and report per-commit wall
    * time by decile. Flat deciles = commit cost independent of log age;
    * the ScalaTest canary (`CommitLogAgeSpec`) asserts the same contract
    * at a smaller n on every suite run.
    */
  private def canary(spark: SparkSession, n: Int): Unit = {
    val work = graft.ops.WorkDirs.workDir("graft_probe_canary")
    val vt = VersionedTable(spark, s"$work/t", Seq("id"), Seq("p"),
      statsCols = Seq("id"))
    val sp = spark
    import sp.implicits._
    def batch(lo: Int): org.apache.spark.sql.DataFrame =
      (lo until lo + 50).map(i => (i, i % 4, s"v$i")).toDF("id", "p", "payload")
    vt.overwrite(batch(0))
    val times = new Array[Double](n)
    var i = 0
    while (i < n) {
      val t0 = System.nanoTime()
      i % 3 match {
        case 0 => vt.append(batch(1000 + i * 50))
        case 1 => vt.setProperties(Map(s"probe.k${i % 7}" -> s"x$i"))
        case 2 => vt.merge(batch(1000 + (i - 2) * 50)
          .withColumn("payload", concat(lit("u"), col("payload"))))
      }
      times(i) = (System.nanoTime() - t0) / 1e9
      i += 1
    }
    val dec = times.grouped(math.max(1, n / 10)).map(g => g.sum / g.length).toSeq
    println(s"""{"probe":"canary","n":$n,"final_version":${vt.currentVersion},""" +
      s""""decile_avg_sec":[${dec.map(s3).mkString(",")}],""" +
      s""""first":${s3(dec.head)},"last":${s3(dec.last)}}""")
  }

  /** Bloom-skipping win at sf scale: a 16-dir table keyed by an md5
    * fingerprint (min/max stats useless — every dir straddles every
    * key), point lookups measured warm with and without the index, plus
    * dirs actually scanned. The shape whose 100 TB extrapolation the
    * index exists for: scan 1/16th of the table instead of all of it.
    */
  private def bloomProbe(spark: SparkSession, sfDir: String): Unit = {
    val work = graft.ops.WorkDirs.workDir("graft_probe_bloom")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), md5(col("o_orderkey").cast("string")).as("fp"),
        col("o_totalprice"))
    val vt = VersionedTable(spark, s"$work/t", Seq("o_orderkey"))
    (0 until 16).foreach { i =>
      val part = orders.filter(col("o_orderkey") % 16 === i)
      if (i == 0) vt.overwrite(part) else vt.append(part)
    }
    def fp(k: Long) = graft.ops.Exprs.md5Hex(k)
    val keys = Seq(1L, 5L, 7L, 32L, 33L)
    def lookups(): (Double, Int) = {
      var dirs = 0
      val t0 = System.nanoTime()
      keys.foreach { k =>
        vt.readWhere(col("fp") === fp(k)).count()
        dirs += vt.lastScanDirs
      }
      ((System.nanoTime() - t0) / 1e9, dirs)
    }
    lookups() // warm (plans, code, FS caches)
    val (noIdxSec, noIdxDirs) = lookups()
    val tIdx0 = System.nanoTime()
    val sidecars = vt.createBloomIndex(Map("fp" -> ((0.01, None))))
    val buildSec = (System.nanoTime() - tIdx0) / 1e9
    lookups() // warm the sidecar cache
    val (idxSec, idxDirs) = lookups()
    println(s"""{"probe":"bloom","rows":${vt.read.count()},"dirs":16,""" +
      s""""lookups":${keys.length},"sidecars_built":$sidecars,""" +
      s""""build_sec":${s3(buildSec)},""" +
      s""""no_index_sec":${s3(noIdxSec)},"no_index_dirs_scanned":$noIdxDirs,""" +
      s""""indexed_sec":${s3(idxSec)},"indexed_dirs_scanned":$idxDirs}""")
  }
}
