package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Parse, ParseFast}

/** Micro-benchmark: builtin regexp_extract bank (one regex exec per group)
  * vs RegexpExtractStruct (one exec per row). Prints one JSON line.
  */
object ParseMicroBench {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("ROWS", "8000000").toLong
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false") // sum(ns) wraps by design
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val did = col("id")
    val lines = spark.range(0, n, 1, 32).select(concat(
      (lit(1700000000L) + did % 1000L).cast("string"), lit("."),
      lpad(((did % 7L) * 125000L).cast("string"), 6, "0"), lit(" "),
      element_at(array(lit("INFO"), lit("WARN"), lit("ERROR")), (did % 3).cast("int") + 1),
      lit(" job-"), did.cast("string")).as("l"))

    def time(name: String, c: org.apache.spark.sql.Column): (String, Double, Long) = {
      val df = lines.select(c.as("o")).select(sum(col("o.ts_ns")).as("s"), sum(when(col("o.ok"), 1L)).as("k"))
      df.head() // warm
      val t0 = System.nanoTime()
      val r = df.head()
      (name, (System.nanoTime() - t0) / 1e9, r.getLong(1))
    }
    val b = time("builtin", Parse.oplog(col("l")))
    val f = time("fast", ParseFast.oplog(col("l")))
    require(b._3 == f._3, s"ok-count mismatch: $b vs $f")
    println(f"""{"metric":"parse_rows_per_sec","rows":$n,"builtin_secs":${b._2}%.2f,"fast_secs":${f._2}%.2f,"speedup":${b._2 / f._2}%.2f}""")
    spark.stop()
  }
}
