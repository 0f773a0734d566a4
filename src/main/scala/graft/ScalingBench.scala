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
      // task-side commit (v2): the v1 driver-side sequential rename of all
      // output files is pure serial time — measured ~7 s at 256 files
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Full pipeline over n generated rows; returns (rows, seconds).
    * mode: "full" (default) writes sinks; "transform" stops at an agg over
    * the routed stream (isolates compute scaling from write scaling);
    * "gen" only generates+counts (isolates the generator).
    */
  private def run(spark: SparkSession, n: Long, out: String,
                  mode: String = "full"): (Long, Double) = {
    val t0 = System.nanoTime()
    val raw = Gen.rawEvents(spark, n, Parts)
    if (mode == "gen") {
      raw.select(sum(col("n_tok"))).head()
    } else {
      val parsed = Parse.parsed(raw)
      val deduped = Dedup.timestampDedup(parsed, col("ts_raw_ns"), Seq(col("source")), col("line_no"))
      val enriched = Enrich.withDim(deduped, Gen.sourceDim(spark), "source")
      val routed = Route.routed(enriched)
      val slim = routed.select("doc_id", "tokens", "n_tok", "source", "line_no",
        "ts_ns", "vendor", "bytes", "parse_ok", "sink")
      if (mode == "transform") slim.select(sum(length(col("doc_id"))), sum(col("ts_ns"))).head()
      else
        // fan-out without a second full-row shuffle: the window stage already
        // distributed the rows; the dynamic-partition writer local-sorts by
        // sink within each task (files/sink = O(tasks), bounded via
        // maxRecordsPerFile at cluster scale)
        slim.write.mode("overwrite").partitionBy("sink").parquet(out)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    (n, secs)
  }

  /** One (N, 4N) measurement pair; returns (throughput_N, throughput_4N). */
  def probe(nSmall: Int, rows: Long, mode: String = "full"): (Double, Double) = {
    val both = Seq(nSmall, nSmall * 4).map { cpus =>
      val spark = session(cpus)
      try {
        run(spark, math.min(rows / 4, 500000L), s"/tmp/graft_scaling_warmup_$cpus", mode)
        // best-of-3 at distinct paths: first timed run still pays residual
        // JIT, and a transient box-load spike can eat a whole attempt
        // (observed: one 4-core leg at 149k vs 196-245k across six other
        // runs); same-path overwrite would add a serial delete
        val secs = Seq(1, 2, 3).map { i =>
          run(spark, rows, s"/tmp/graft_scaling_${cpus}_$i", mode)._2
        }.min
        (rows / secs, secs)
      } finally spark.stop()
    }
    (both.head._1, both.last._1)
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "4000000").toLong
    val nSmall = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "1").toInt
    val nBig = nSmall * 4
    val mode = sys.env.getOrElse("SPARK_GRAFT_BENCH_MODE", "full")
    val (thrN, thr4N) = probe(nSmall, rows, mode)
    val eff = (thr4N / thrN) / (nBig.toDouble / nSmall)
    println(f"""{"metric":"pipeline_seq_per_sec","rows":$rows,""" +
      f""""n_cores":$nSmall,"n_seq_per_sec":${thrN.toLong},""" +
      f""""4n_cores":$nBig,"4n_seq_per_sec":${thr4N.toLong},""" +
      f""""scaling_efficiency":$eff%.3f}""")
  }
}
