package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for the ES message parse: the per-key
  * `Elastic.msgValue` HOF chain (CodegenFallback; after project collapse it
  * re-splits the message once per extracted field — 22× for the
  * process-create layout) vs the one-pass [[graft.functions.KvLinesStruct]]
  * codegen scan. The frame is f06's own fixture arithmetic (ProtoSynth over
  * rawEvents2 dids) so the messages are the real re-ingest payloads; a hash
  * aggregate over every extracted column forces full evaluation so column
  * pruning can't flatter either side.
  */
object AbKvParse {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Positional, ProtoSynth}
    import graft.sources.Elastic

    val proto = Positional.sysmonCsv.head // w_process_create: 22 message keys
    val msgCol = concat_ws("\n",
      proto.fields.zipWithIndex.drop(3).map { case (f, i) =>
        concat(lit(Elastic.messageKey(f.name) + ": "),
          ProtoSynth.raw(f.t, i, col("did")))
      }: _*)
    val msgs = sources.Tables.rawEvents2(spark, sfDir)
      .select(msgCol.as("message")).localCheckpoint()
    val n = msgs.count()
    val keys = proto.fields.drop(3).map(f => Elastic.messageKey(f.name))

    def force(df: DataFrame): Long = {
      val t0 = System.nanoTime()
      df.agg(sum(hash(keys.map(col): _*))).collect()
      System.nanoTime() - t0
    }
    val hof = msgs.select(
      keys.map(k => Elastic.msgValue(col("message"), k).as(k)): _*)
    val onePassKv = graft.functions.KvLinesStruct.of(col("message"), keys)
    val onePass = msgs.withColumn("_kv", onePassKv)
      .select(keys.map(k => col("_kv").getField(k).as(k)): _*)

    force(onePass); force(hof) // warm both codepaths
    for (round <- 1 to 3) {
      val a = force(onePass) / 1e9
      val b = force(hof) / 1e9
      println(f"[abkv] round=$round rows=$n one_pass=$a%.2f hof=$b%.2f ratio=${b / a}%.2f")
    }
    spark.stop()
  }
}
