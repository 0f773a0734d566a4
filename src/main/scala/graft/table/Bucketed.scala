package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for co-located (shuffle-free) joins — the pre-shuffle
  * idiom for the repeated big-big joins a 100 TB deployment makes: pay the
  * clustering once at write, then every join/aggregate on the bucket key
  * runs with zero Exchange.
  *
  * The reference has no joins, so this is pure north-rule scale
  * infrastructure (SURVEY.md §2.9/§4): bucket the tokens/sink tables by the
  * key they are repeatedly joined or grouped on (doc bucket / source).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted catalog table. */
  def write(df: DataFrame, table: String, key: String, buckets: Int,
            mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket count:
    * planner elides both shuffles (and, with sortBy, both sorts).
    */
  def cocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
