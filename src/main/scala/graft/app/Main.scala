package graft.app

import org.apache.spark.sql.SparkSession
import graft.plans.Pipeline
import graft.table.SinkTable

/** spark-submit entrypoint: run the full parse→enrich→route→aggregate
  * pipeline over a testdata dir, write per-sink tables + manifest, print the
  * per-sink report. Args: <sfDir> <outBase> [commitId] [--rollback-first]
  *
  * `--rollback-first` drops the last manifest before running — the resume
  * drill: re-running must produce identical sink contents (no dupes/gaps),
  * mirroring the reference's checkpoint semantics
  * (/root/reference/src/checkpoint.rs:44-116).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outBase = if (args.length > 1) args(1) else "/tmp/graft_out"
    val commitId = if (args.length > 2) args(2).toLong else 1L
    val rollback = args.contains("--rollback-first")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.Sessions.local(cpus, "graft-pipeline")

    if (rollback) new SinkTable(outBase).rollbackLast()
    val report = Pipeline.run(spark, sfDir, outBase, commitId)
    report.orderBy("sink").show(50, truncate = false)

    val t = new SinkTable(outBase)
    println(s"[graft] manifests=${t.manifests.map(m => s"#${m.commitId}:rows=${m.rows},maxLine=${m.maxLineNo}").mkString(" ")}")
    println(s"[graft] committed_rows=${t.read(spark).count()} current=${t.currentCommit.getOrElse(-1L)}")
    spark.stop()
  }
}
