package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Skew

class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", "4")
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one key — the classic straggler shape
    val left = spark.range(10000)
      .select(when(col("id") % 10 < 9, lit("hot")).otherwise(lit("cold"))
        .as("k"), col("id"))
    val right = Seq(("hot", 1), ("cold", 2)).toDF("k", "v")
    val plain = left.join(right, Seq("k")).agg(sum("v"), count(lit(1))).head()
    val salted = Skew.saltedJoin(left, right, "k", factor = 8)
      .agg(sum("v"), count(lit(1))).head()
    assert(plain == salted)
  }

  test("salted count equals plain count per key") {
    import spark.implicits._
    val df = spark.range(5000)
      .select(when(col("id") % 100 < 99, lit("hot")).otherwise(lit("cold")).as("k"))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, "k", factor = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain == salted)
  }
}
