package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-sink transfer report: count + byte statistics, the reference's only
  * aggregation (/root/reference/src/bin/reproduce/report.rs:77-213 — per-run
  * count, sum/min/max/avg record bytes, throughput).
  *
  * groupBy(sink) is a hash aggregate with map-side partial aggregation —
  * at 10^12 rows each of ~32k shuffle partitions only ships one row per
  * sink value, so the shuffle is O(sinks × partitions), not O(rows).
  */
object Report {

  def perSink(df: DataFrame, sink: Column = col("sink"), bytes: Column = col("bytes")): DataFrame =
    df.groupBy(sink.as("sink"))
      .agg(
        count(lit(1)).as("records"),
        sum(bytes).as("sum_bytes"),
        min(bytes).as("min_bytes"),
        max(bytes).as("max_bytes"),
        // integer avg (floor) keeps the oracle comparison exact — no
        // float-order nondeterminism across engines
        floor(sum(bytes) / count(lit(1))).cast("long").as("avg_bytes_floor"),
        sum(when(col("parse_ok"), 1L).otherwise(0L)).as("success_cnt"),
        sum(when(!col("parse_ok"), 1L).otherwise(0L)).as("failed_cnt")
      )
}
