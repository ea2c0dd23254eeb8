package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ScalePathSpec extends SparkSpec {

  test("bucketed join on matching bucket counts is exchange-free") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    try {
      Bucketing.writeBucketed(Tables.load(spark, sf, "lineitem"),
        "li_bucketed", Seq("l_orderkey"), numBuckets = 4)
      Bucketing.writeBucketed(Tables.load(spark, sf, "orders"),
        "o_bucketed", Seq("o_orderkey"), numBuckets = 4)
      val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "o_bucketed",
        col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      assert(Bucketing.shuffleCount(joined) == 0,
        s"expected no shuffle:\n${joined.queryExecution.executedPlan}")
      // same row count as the shuffled join
      val expected = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("salted join returns exactly the plain-join result") {
    val left = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val right = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val plain = left.join(right, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)), sum("l_quantity")).head()
    val salted = Skew.saltedJoin(left, right,
      col("l_orderkey"), col("o_orderkey"), saltFactor = 4)
      .agg(count(lit(1)), sum("l_quantity")).head()
    assert(salted == plain)
  }
}
