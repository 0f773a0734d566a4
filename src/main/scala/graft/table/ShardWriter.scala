package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes a deterministic training order
  * ([[graft.ops.CurationOps.trainOrder]]) as on-disk shards: one sorted
  * parquet file per bucket, laid out as `bucket=<b>/part-…` so a trainer
  * (or a re-read here) streams shards in (bucket, ord) order and replays
  * one fixed global shuffle.
  *
  * The write is the sorted-bucket-writer pattern: repartition by the
  * bucket column (each bucket lands whole in one task — bucket count
  * scales with the corpus, so a bucket stays file-sized), sort within the
  * partition, write with `partitionBy`. No global sort ever happens.
  */
object ShardWriter {

  /** ordered: (doc_id, bucket, ord, …) from trainOrder. */
  def writeShards(ordered: DataFrame, outDir: String): Unit =
    ordered
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("ord"))
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(outDir)

  /** Reads shards back in replay order (bucket asc, ord asc). */
  def readShards(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir).orderBy(col("bucket"), col("ord"))
}
