package graft

import org.apache.spark.sql.SparkSession

/** Adjacent same-JVM A/B over the g-series tail — chases the round-5
  * driver-run `g19_radius` transient (23.5 s in the driver's window vs
  * 1.2–1.4 s in four committed same-code runs). Interleaves three rounds of
  * the tail queries in ONE JVM so a real plan problem would reproduce every
  * round while host weather shows up as cross-round variance on unchanged
  * code (the same protocol that settled the r4 bench-drift question).
  */
object AbGSeries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("p02_tokens_full")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val names = Seq("g14_tls", "g15_smb", "g16_nfs", "g17_bootp", "g18_dhcp",
      "g19_radius", "g20_icmp").filter(SparkEntry.queries.contains)
    for (round <- 1 to 3) {
      val line = names.map { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        f"$n=${(System.nanoTime() - t0) / 1e9}%.2f"
      }.mkString(" ")
      println(s"[abg] round=$round $line")
    }
    spark.stop()
  }
}
