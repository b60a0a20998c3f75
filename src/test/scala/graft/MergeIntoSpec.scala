package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, lit}

import graft.lake.VersionedTable

/** Conditional-clause MERGE (Delta's builder surface): first-match-wins
  * clause ordering, conditional update/delete/insert, not-matched-by-source
  * clauses, contract refusals, and change recording through the new path.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def contents(t: VersionedTable): Set[(Int, Int, String)] =
    t.read.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  test("conditional matched clauses evaluate in order, first satisfied wins") {
    val t = VersionedTable(spark, tmpDir("mi") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2"), (4, 40, "p2")))
    val src = df((1, 100, "p1"), (2, 5, "p1"), (3, 300, "p2"), (9, 90, "p3"))
    t.mergeInto(src)
      .whenMatched(expr("s.amount > t.amount")).updateAll()
      .whenMatched().delete()            // matched rows the first clause skipped
      .whenNotMatched(expr("s.amount >= 90")).insertAll()
      .execute()
    // 1: 100>10 → updated; 2: 5>20 false → deleted; 3: updated; 4 untouched
    // (not in source); 9: inserted (90 >= 90)
    assert(contents(t) == Set(
      (1, 100, "p1"), (3, 300, "p2"), (4, 40, "p2"), (9, 90, "p3")))
    assert(t.history.last._2 == "merge")
    assert(t.readVersion(1).count() == 4) // time travel intact
  }

  test("column-level update/insert clauses and by-source clauses") {
    val t = VersionedTable(spark, tmpDir("mi2") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p1"), (5, 50, "p2"), (6, 60, "p2")))
    val src = df((1, 1, "p1"), (7, 7, "p3"))
    t.mergeInto(src)
      .whenMatched().update(Map("amount" -> (col("t.amount") + col("s.amount"))))
      .whenNotMatched().insert(Map(
        "id" -> col("s.id"), "amount" -> lit(999), "part" -> col("s.part")))
      .whenNotMatchedBySource(expr("t.amount >= 60")).delete()
      .whenNotMatchedBySource().update(Map("amount" -> (col("t.amount") + 1)))
      .execute()
    // 1 matched: 10+1=11; 7 inserted with amount 999; 6 (no source, >=60)
    // deleted; 2 and 5 (no source) bumped +1
    assert(contents(t) == Set(
      (1, 11, "p1"), (2, 21, "p1"), (5, 51, "p2"), (7, 999, "p3")))
  }

  test("unclaimed rows keep (matched/target) or drop (source)") {
    val t = VersionedTable(spark, tmpDir("mi3") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p1")))
    val src = df((1, 100, "p1"), (8, 80, "p1"))
    t.mergeInto(src)
      .whenMatched(expr("s.amount > 1000")).updateAll() // claims nothing
      .whenNotMatched(expr("s.amount > 1000")).insertAll() // claims nothing
      .execute()
    assert(contents(t) == Set((1, 10, "p1"), (2, 20, "p1")))
  }

  test("partition and generated columns are protected") {
    val t = VersionedTable(spark, tmpDir("mi4") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1")))
    val src = df((1, 11, "p1"))
    intercept[IllegalArgumentException](
      t.mergeInto(src).whenMatched().update(Map("part" -> lit("p9"))).execute())
    val g = VersionedTable(spark, tmpDir("mi4") + "/g", Seq("id"))
    g.overwrite(Seq((1, 5)).toDF("id", "amount").withColumn("bucket", expr("amount div 10")))
    g.addGeneratedColumn("bucket", "amount div 10")
    intercept[IllegalArgumentException](
      g.mergeInto(Seq((1, 6)).toDF("id", "amount"))
        .whenMatched().update(Map("bucket" -> lit(9))).execute())
    // generated columns re-derive when their sources change
    g.mergeInto(Seq((1, 25)).toDF("id", "amount"))
      .whenMatched().update(Map("amount" -> col("s.amount"))).execute()
    assert(g.read.select(col("bucket").cast("int")).as[Int].collect().toSeq == Seq(2))
  }

  test("mergeInto records change images; the recorded feed nets them") {
    val t = VersionedTable(spark, tmpDir("mi5") + "/t", Seq("id"), Seq("part"),
      recordCdf = true)
    t.overwrite(df((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2")))
    t.mergeInto(df((1, 100, "p1"), (2, 20, "p1"), (9, 90, "p2")))
      .whenMatched(expr("s.amount > t.amount")).updateAll()
      .whenMatched().delete()
      .whenNotMatched().insertAll()
      .execute()
    val f = t.changeFeed(1, 2)
    assert(f.select("id", "amount", "change_type").as[(Int, Int, String)]
      .collect().toSet == Set(
        (1, 100, "update"), (2, 20, "delete"), (9, 90, "insert")))
    assert(f.inputFiles.nonEmpty && f.inputFiles.forall(_.contains("/_changes/")))
  }

  test("untouched partitions stay live from their original version") {
    val t = VersionedTable(spark, tmpDir("mi6") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))
    t.mergeInto(df((1, 11, "p1")))
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
    // only p1 was touched: one add, one remove
    val h = t.history.last
    assert(h._2 == "merge" && h._3 == 1 && h._4 == 1)
    assert(contents(t) == Set((1, 11, "p1"), (2, 20, "p2")))
  }

  test("primary keys are protected: no update assignment, no NULL inserts, no duplicate sources") {
    val t = VersionedTable(spark, tmpDir("mi8") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1")))
    // update clause assigning the pk is refused
    intercept[IllegalArgumentException](
      t.mergeInto(df((1, 11, "p1")))
        .whenMatched().update(Map("id" -> lit(99))).execute())
    // a source without the pk column would NULL-key its inserts — refused
    intercept[IllegalArgumentException](
      t.mergeInto(Seq((7, "p1")).toDF("key", "part"))
        .whenNotMatched().insert(Map("amount" -> lit(1), "part" -> col("s.part")))
        .execute())
    // an insert clause may still assign the pk explicitly
    t.mergeInto(Seq((7, 70, "p1")).toDF("id", "amount", "part"))
      .whenNotMatched().insert(Map(
        "id" -> (col("s.id") + 100), "amount" -> col("s.amount"),
        "part" -> col("s.part")))
      .execute()
    assert(contents(t) == Set((1, 10, "p1"), (107, 70, "p1")))
    // duplicate source keys are refused (Delta's MULTIPLE_MATCHES rule)
    val e = intercept[IllegalArgumentException](
      t.mergeInto(df((1, 11, "p1"), (1, 12, "p1")))
        .whenMatched().updateAll().execute())
    assert(e.getMessage.contains("unique source keys"))
    assert(t.currentVersion == 2) // the refused merges committed nothing
  }

  test("insert clause staging into a live partition outside the source's " +
      "partitions keeps that partition's pre-existing rows") {
    val t = VersionedTable(spark, tmpDir("mi9") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2"), (3, 30, "p2")))
    // source rows all carry part=p1, but the insert clause REDIRECTS the
    // new row into p2 — a partition with live rows that the source-derived
    // touched set does not cover. The staged p2 leaf must not supersede
    // p2's dirs with only the inserted row.
    t.mergeInto(Seq((9, 90, "p1")).toDF("id", "amount", "part"))
      .whenNotMatched().insert(Map(
        "id" -> col("s.id"), "amount" -> col("s.amount"),
        "part" -> lit("p2")))
      .execute()
    assert(contents(t) == Set(
      (1, 10, "p1"), (2, 20, "p2"), (3, 30, "p2"), (9, 90, "p2")))
    // prior versions stay intact under the widened restage
    assert(t.readVersion(1).count() == 3)
  }

  test("insert clause defaulting an omitted partition column to NULL does " +
      "not clobber other partitions") {
    val t = VersionedTable(spark, tmpDir("mi10") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))
    // source lacks the partition column entirely: the insert defaults it
    // to NULL, staging a part=__HIVE_DEFAULT_PARTITION__ leaf outside the
    // touched set. Nothing pre-existing may be lost.
    t.mergeInto(Seq((9, 90)).toDF("id", "amount"))
      .whenNotMatched().insert(Map(
        "id" -> col("s.id"), "amount" -> col("s.amount")))
      .execute()
    val all = t.read.select("id", "amount").as[(Int, Int)].collect().toSet
    assert(all == Set((1, 10), (2, 20), (9, 90)))
    assert(t.read.filter(col("part").isNull).count() == 1)
  }

  test("pk/partition specs cased differently from the schema still get " +
      "key-keeping and partition-stable protection") {
    val t = VersionedTable(spark, tmpDir("mi11") + "/t", Seq("ID"), Seq("PART"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))
    t.mergeInto(df((1, 100, "p1"), (9, 90, "p1")))
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
    assert(contents(t) == Set((1, 100, "p1"), (2, 20, "p2"), (9, 90, "p1")))
  }

  test("WITH SCHEMA EVOLUTION on a clause merge: source-only columns " +
      "join the schema, untouched rows read NULL, time travel is " +
      "era-correct, explicit SET may assign the new column") {
    val t = VersionedTable(spark, tmpDir("mi12") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2"), (3, 30, "p2")))     // v1
    // evolving upsert: touches only p1; score is source-only
    t.mergeInto(Seq((1, 100, "p1", 0.9), (9, 90, "p1", 0.5))
        .toDF("id", "amount", "part", "score"))
      .withSchemaEvolution()
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()                                                      // v2
    assert(t.tableSchema.fieldNames.toSeq ==
      Seq("id", "amount", "part", "score"))
    val got = t.read.select("id", "amount", "part", "score")
      .as[(Int, Int, String, Option[Double])].collect().toSet
    assert(got == Set((1, 100, "p1", Some(0.9)), (9, 90, "p1", Some(0.5)),
      (2, 20, "p2", None), (3, 30, "p2", None)),
      s"untouched p2 rows must read NULL for the evolved column; got $got")
    // era-correct: v1 never shows the column
    assert(!t.readVersion(1).columns.contains("score"))
    // fresh handle replays the widened schema
    assert(t.copy().tableSchema.fieldNames.contains("score"))
    // explicit SET may assign the new column on a later evolving merge
    t.mergeInto(Seq((2, "p2", 0.7)).toDF("id", "part", "score2"))
      .withSchemaEvolution()
      .whenMatched().update(Map("score" -> col("s.score2")))
      .execute()                                                      // v3
    assert(t.read.filter(col("id") === 2).select("score").as[Double]
      .head() == 0.7)
    // WITHOUT the clause, source-only columns are ignored as before
    t.mergeInto(Seq((3, 33, "p2", "noise")).toDF("id", "amount", "part", "junk"))
      .whenMatched().updateAll()
      .execute()                                                      // v4
    assert(!t.read.columns.contains("junk"))
  }

  test("a matched-delete that empties a partition removes its dirs") {
    val t = VersionedTable(spark, tmpDir("mi7") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))
    t.mergeInto(df((1, 0, "p1")))
      .whenMatched().delete()
      .execute()
    assert(contents(t) == Set((2, 20, "p2")))
    val h = t.history.last
    assert(h._3 == 0 && h._4 == 1) // nothing staged for p1, its dir removed
  }
}
