package graft

import org.apache.spark.sql.SparkSession

/** Diagnosis-only: print each testdata table's Spark schema as DDL (used
  * once to pin the explicit schemas in sources.Tables).
  */
object PrintSchemas {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Seq("documents", "embeddings", "events", "lineitem", "orders",
      "customer", "nation", "region", "supplier", "part")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"[schema] $t :: ${df.schema.toDDL}")
    }
    spark.stop()
  }
}
