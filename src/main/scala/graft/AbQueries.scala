package graft

import org.apache.spark.sql.SparkSession

/** Generic same-JVM interleaved A/B over any driver queries — the repo's
  * standard protocol for separating plan problems from shared-box host
  * weather (a real plan cost reproduces every interleaved round; weather
  * shows up as cross-round variance on unchanged code). Names come from
  * args; three rounds after one warmup query.
  * Usage: runMain graft.AbQueries d07_embed_neardup a01_ann_brute ...
  */
object AbQueries {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass driver query names as args")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = args.toSeq.filter { n =>
      val ok = SparkEntry.queries.contains(n)
      if (!ok) println(s"[abq] UNKNOWN query $n — skipped")
      ok
    }
    try SparkEntry.queries("p02_tokens_full")(spark, sfDir).count()
    catch { case _: Throwable => () }
    for (round <- 1 to 3) {
      val line = names.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        f"$n=${(System.nanoTime() - t0) / 1e9}%.2f"
      }.mkString(" ")
      println(s"[abq] round=$round $line")
    }
    spark.stop()
  }
}
