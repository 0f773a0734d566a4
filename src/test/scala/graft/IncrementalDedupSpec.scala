package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sources.Tables

/** Two-batch incremental-dedup drill: batch 2 repeats half of batch 1 —
  * against the persisted hash index the repeats vanish, within-batch dups
  * still collapse, and the union of kept rows equals a whole-corpus dedup
  * of everything seen (incremental ≡ batch, the invariant that makes the
  * index trustworthy).
  */
class IncrementalDedupSpec extends SparkSpec {

  test("incremental dedup over a persisted index equals whole-corpus dedup") {
    val idx = Files.createTempDirectory("graft-dedup-idx").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val batch1 = docs.where(col("doc_id") < 30)
    // batch 2: fresh docs + re-crawls of 10 batch-1 texts under new ids +
    // an internal duplicate pair
    val recrawl = batch1.where(col("doc_id") < 10)
      .withColumn("doc_id", col("doc_id") + 5000L)
    val internal = docs.where(col("doc_id") === 40L)
      .withColumn("doc_id", lit(6000L))
    val batch2 = docs.where(col("doc_id") >= 30 && col("doc_id") < 50)
      .unionByName(recrawl).unionByName(internal)

    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("text_hash", org.apache.spark.sql.types.StringType))
    val kept1 = DedupOps.dedupAgainstIndex(batch1, empty)
    kept1.select("text_hash").write.mode("overwrite").parquet(idx)

    val kept2 = DedupOps.dedupAgainstIndex(batch2, spark.read.parquet(idx))
    kept2.select("text_hash").write.mode("append").parquet(idx)

    // re-crawled texts were suppressed, the internal dup collapsed
    assert(kept2.where(col("doc_id") >= 5000L && col("doc_id") < 6000L).count() === 0L)
    assert(kept2.where(col("text") === docs.where(col("doc_id") === 40L)
      .head.getAs[String]("text")).count() === 1L)
    // incremental ≡ batch over everything seen
    val all = batch1.unionByName(batch2)
    val wholeCorpus = DedupOps.exactDedup(all).select("text").collect().map(_.getString(0)).toSet
    val incremental = kept1.select("text").unionByName(kept2.select("text"))
      .collect().map(_.getString(0)).toSet
    assert(incremental === wholeCorpus)
    // index has exactly one row per distinct text
    assert(spark.read.parquet(idx).distinct().count() === wholeCorpus.size.toLong)
  }

  test("incremental LSH equals the delta-restricted full-LSH result and broadcasts the delta") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .repartition(spark.sparkContext.defaultParallelism)
    val sh = DedupOps.shingleRows(docs, "doc_id", "text", 8).localCheckpoint(true)
    val deltaPred = col("sid") % 5 === 0
    val incr = DedupOps.lshAgainstIndex(sh, deltaPred, k = 16, r = 4, minJacE6 = 300000L)

    // the broadcast side of the candidate probe must be the delta bands —
    // the standing corpus never shuffles on the band key
    val plan = incr.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "candidate probe is not a broadcast join")

    // full-corpus LSH + jaccard, restricted to (index, delta) pairs, must
    // equal the incremental result exactly (a_id < b_id in the full form
    // can put the delta doc on either side — normalize)
    val full = DedupOps.jaccardRows(sh, DedupOps.lshCandidatesRows(sh, k = 16, r = 4))
      .withColumn("jac_e6", expr("(inter * 1000000) div (sz_a + sz_b - inter)"))
      .where(col("jac_e6") >= 300000L)
      .where((col("doc_a") % 5 === 0) =!= (col("doc_b") % 5 === 0))
      .select(
        when(col("doc_a") % 5 === 0, col("doc_b")).otherwise(col("doc_a")).as("index_id"),
        when(col("doc_a") % 5 === 0, col("doc_a")).otherwise(col("doc_b")).as("delta_id"),
        col("jac_e6"))
    val a = incr.select("index_id", "delta_id", "jac_e6")
    assert(a.exceptAll(full).isEmpty && full.exceptAll(a).isEmpty,
      "incremental LSH diverges from the delta-restricted full LSH")
    // every reported duplicate is a delta doc matched to an index doc
    assert(incr.where(col("delta_id") % 5 =!= 0 || col("index_id") % 5 === 0).isEmpty)
  }
}
