package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The raw-log fallback path (reference src/collector/log.rs:129-194):
  * whole line as bytes into a `(kind, log binary, ts_ns)` record, empty
  * lines skipped (`BinaryLines` strips the terminator and the collector
  * drops len==0 lines). The reference stamps wall-clock nanos; here the
  * timestamp is a caller-provided deterministic column so runs are
  * reproducible (SURVEY §7.4.3 determinism rule).
  */
object RawLog {

  /** Wrap a `value: string` line column as the binary Log record. */
  def wrap(lines: DataFrame, kind: String, tsNs: Column): DataFrame =
    lines.where(length(col("value")) > 0)
      .select(lit(kind).as("kind"), encode(col("value"), "UTF-8").as("log"), tsNs.as("ts_ns"))

  /** Read a real line-oriented log file (the §2.1 raw-log scan). */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.format("text").load(path)

  /** Stage a deterministic fixture file (one write per distinct path+mode,
    * overwritten each run) and return its path — fixture setup for the
    * real-file-reader queries; the measured operator is the read back.
    */
  def stage(df: DataFrame, name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    val path = s"target/stage/${name}_$tag"
    df.coalesce(1).write.mode("overwrite").text(path)
    path
  }

  /** Stage a single file whose FIRST line is a header (the sysmon CSV
    * reader config — `option("header", true)` skips it per file); line
    * order after the header is irrelevant to the set-compared oracle.
    */
  def stageWithHeader(df: DataFrame, header: String, name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^0-9a-zA-Z]", "_")
    val dir = new java.io.File(s"target/stage/${name}_$tag")
    dir.mkdirs()
    val lines = df.collect().map(_.getString(0))
    val content = (header +: lines).mkString("", "\n", "\n")
    java.nio.file.Files.write(
      new java.io.File(dir, "part-000.tsv").toPath, content.getBytes("UTF-8"))
    dir.getPath
  }
}
