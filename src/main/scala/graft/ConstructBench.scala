package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnosis-only: where does per-query DataFrame CONSTRUCTION time go for
  * the proto-parse queries (g14 measured ~1.3 s steady just to build the
  * frame)? Times each sub-step in isolation.
  */
object ConstructBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Positional, ProtoSynth}
    val proto = Positional.giganto(13) // g14_tls
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cb] $label%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    for (rep <- 1 to 3) {
      println(s"[cb] --- rep $rep ---")
      val base = time("rawEvents2") {
        graft.sources.Tables.rawEvents2(spark, sfDir).select(col("doc_id"), col("did"))
      }
      val line = time("line build") { ProtoSynth.line(proto, col("did")) }
      val o = time("parser build") { Positional.parser(proto)(line) }
      val sel1 = time("select o") { base.select(col("doc_id"), o.as("o")) }
      val flt = time("where ok") { sel1.where(col("o.ok")) }
      val out = time("final select") {
        flt.select(col("doc_id") +:
          proto.fields.flatMap(f => ProtoSynth.outCols(f.t, f.name, col(s"o.${f.name}"))): _*)
      }
      val agg = time("groupBy.count build") { out.groupBy().count() }
      time("executedPlan") { agg.queryExecution.executedPlan }
      time("collect") { agg.collect() }
    }
    spark.stop()
  }
}
