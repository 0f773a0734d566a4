package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.table.Bucketed

/** Bucketed co-located join: same key, same bucket count → the physical
  * plan has NO Exchange (shuffle paid once at write time, not per join).
  */
class BucketedSpec extends SparkSpec {

  test("bucketed-bucketed equi-join plans with zero Exchange and matches unbucketed result") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      Bucketed.write(Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", buckets = 8)
      Bucketed.write(Tables.orders(spark, Sf)
        .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        "b_orders", "l_orderkey", buckets = 8)

      val joined = Bucketed.cocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")

      val expected = Tables.lineitem(spark, Sf)
        .join(Tables.orders(spark, Sf), col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("groupBy on the bucket key also elides the shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketed.write(Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity"),
        "b_li2", "l_orderkey", buckets = 8)
      val agg = spark.table("b_li2").groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("q"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed groupBy must not shuffle:\n$plan")
      assert(agg.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_li2")
    }
  }
}
