package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.DedupOps

/** Adjacent-leg A/B of the doc-level vs group-collapsed clustering in ONE
  * JVM (host drift hits both legs equally): A-B-A-B over the same
  * checkpointed shingle rows. Diagnostic main, not part of the driver
  * contract. Usage: runMain graft.AbClusters <sfDir>
  */
object AbClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cliques = args.drop(1).headOption.map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // cliques > 0 plants that many VERBATIM copies of every 25th doc —
    // the verbatim-family regime (each family is a pairwise clique, doc
    // pairs grow quadratically) that the rotated 10× upscaler avoids
    val docs =
      if (cliques == 0) base
      else base.unionByName(
        base.where(col("doc_id") % 25 === 0)
          .crossJoin(spark.range(1, cliques + 1).select(col("id").as("cp")))
          .select((col("doc_id") + col("cp") * 10000000L).as("doc_id"), col("text")))
    val rows = DedupOps.shingleRows(
      docs.repartition(spark.sparkContext.defaultParallelism),
      "doc_id", "text", 8, dedup = false).localCheckpoint(true)
    def timed(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[ab] $tag rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def plain(): Long = DedupOps.duplicateClusters(
      DedupOps.lshCandidatesRows(rows, 16, 4)).count()
    def collapsed(): Long =
      DedupOps.duplicateClustersCollapsed(rows, 16, 4).count()
    timed("warmup-plain")(plain())
    (1 to 2).foreach { i =>
      timed(s"plain-$i")(plain()); timed(s"collapsed-$i")(collapsed())
    }
    spark.stop()
  }
}
