package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Gen
import graft.operators.{Dedup, Enrich, Parse, Route}

/** North-rule scaling evidence: the same end-to-end parse→dedup→enrich→
  * route→sink job at two parallelism levels (local[N] and local[4N]) over an
  * identical deterministic input, reporting sequences/sec at both plus
  * scaling efficiency = (throughput_4N / throughput_N) / 4.
  *
  * This is the sandbox proxy for the BASELINE.json criterion "≥0.8 from N to
  * 4N executors": no real cluster exists here, so parallelism is the core
  * count of a single-JVM local master. Input generation is Catalyst-only
  * (Gen.rawEvents) and seeded by row id, so both runs process byte-identical
  * rows. Partition count is fixed (PARTS) at both sizes so the work units are
  * identical and only the executor-slot count varies — the local analog of
  * holding the data layout constant while growing the cluster.
  *
  * Env: SPARK_GRAFT_BENCH_ROWS (default 4e6), SPARK_GRAFT_BENCH_N (default 8).
  */
object ScalingBench {

  private val Parts = 64

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", Parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Full pipeline over n generated rows; returns (rows, seconds). */
  private def run(spark: SparkSession, n: Long, out: String): (Long, Double) = {
    val t0 = System.nanoTime()
    val raw = Gen.rawEvents(spark, n, Parts)
    val parsed = Parse.parsed(raw)
    val deduped = Dedup.timestampDedup(parsed, col("ts_raw_ns"), Seq(col("source")), col("line_no"))
    val enriched = Enrich.withDim(deduped, Gen.sourceDim(spark), "source")
    val routed = Route.routed(enriched)
    routed.select("doc_id", "tokens", "n_tok", "source", "line_no",
        "ts_ns", "vendor", "bytes", "parse_ok", "sink")
      .repartition(col("sink"), pmod(xxhash64(col("doc_id")), lit(8)))
      .write.mode("overwrite").parquet(out)
    val secs = (System.nanoTime() - t0) / 1e9
    (n, secs)
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "4000000").toLong
    val nSmall = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "8").toInt
    val nBig = nSmall * 4

    val results = Seq(nSmall, nBig).map { cpus =>
      val spark = session(cpus)
      try {
        run(spark, 100000L, s"/tmp/graft_scaling_warmup_$cpus") // JIT/codegen warmup
        val (_, secs) = run(spark, rows, s"/tmp/graft_scaling_$cpus")
        cpus -> (rows / secs, secs)
      } finally spark.stop()
    }
    val (thrN, secsN) = results.head._2
    val (thr4N, secs4N) = results.last._2
    val eff = (thr4N / thrN) / (nBig.toDouble / nSmall)
    println(f"""{"metric":"pipeline_seq_per_sec","rows":$rows,""" +
      f""""n_cores":$nSmall,"n_secs":$secsN%.2f,"n_seq_per_sec":${thrN.toLong},""" +
      f""""4n_cores":$nBig,"4n_secs":$secs4N%.2f,"4n_seq_per_sec":${thr4N.toLong},""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
