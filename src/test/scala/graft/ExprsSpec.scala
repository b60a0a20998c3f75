package graft

import org.apache.spark.sql.functions._

import graft.ops.Exprs

class ExprsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercased, whitespace-split, empties removed") {
    val out = Seq("Hello  World", "  ", "a\tB\nc").toDF("text")
      .select(Exprs.tokens(col("text"))).as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("hello", "world"), Seq(), Seq("a", "b", "c")))
  }

  test("shingles: n-grams with space joins; short docs yield empty") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(Exprs.shingles(Exprs.tokens(col("text")), 3))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("md5Int: stable 32-bit value matching the documented DuckDB formula") {
    val v = Seq("hello").toDF("x")
      .select(Exprs.md5Int("salt", col("x"))).as[Long].head()
    // java MessageDigest reference value for md5("salthello") first 8 hex
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("salthello".getBytes).map("%02x".format(_)).mkString.take(8)
    assert(v == java.lang.Long.parseLong(hex, 16))
    assert(v >= 0L && v < (1L << 32))
  }

  test("qdot: exact integer dot product of quantized float arrays") {
    val v = Seq((Array(1.0f, 2.0f), Array(3.0f, 0.5f))).toDF("a", "b")
      .select(Exprs.qdot(col("a"), col("b"))).as[Long].head()
    assert(v == 1000L * 3000 + 2000L * 500)
  }
}
