package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a pathologically hot join key is split at
  * runtime (OptimizeSkewedJoin marks the join `skew=true`), with results
  * identical to the unskewed plan. Complements Enrich.salted (static
  * mitigation, s01 oracle) — AQE is the runtime mitigation the north star
  * names.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition (skew=true in final plan)") {
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      // 95% of fact rows share one key; dim has one row per key
      val fact = spark.range(0, 200000).select(
        when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 10).as("w"))
      // NOTE: an ensuing groupBy(k) would pin the join's hash partitioning
      // and make AQE decline the split — a real planning constraint worth
      // encoding here; the global agg leaves the join free to split
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      val row = joined.collect().head
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n${plan.take(4000)}")
      // correctness unchanged by the split: 190k hot rows + 10k distributed
      assert(row.getLong(0) === 200000L)
      // sw = Σ w over matched rows: hot rows get w=70; id%20==0 rows get (id%1000)*10
      val expectedSw = 190000L * 70L +
        (0L until 200000L by 20).map(id => (id % 1000) * 10).sum
      assert(row.getLong(1) === expectedSw)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
