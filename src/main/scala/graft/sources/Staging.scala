package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staging-directory ingest with file-name-derived routing — the Spark form
  * of the reference's Elasticsearch flow: ES pages are dumped as
  * `event{code}_log.csv` staging files, then re-ingested with the kind
  * derived from the file name by regex
  * (/root/reference/src/bin/reproduce/main.rs:900-949; `file_to_kind`
  * `event(\d+)_log` → Sysmon kind, main.rs:1329-1343).
  *
  * Spark-first: one glob read of the whole staging dir (not one job per
  * file), `input_file_name()` preserved as lineage, kind = regexp over the
  * path, then the normal parse→route stages. At 100 TB the staging dir is
  * just another partitioned table; file-name routing costs one codegen'd
  * regexp per row.
  */
object Staging {

  /** event code extracted from the staged file's name; NULL if the name
    * doesn't match (reference skips unknown files).
    */
  def eventCodeFromFile(file: Column): Column =
    nullif(regexp_extract(file, "event(\\d+)_log", 1), lit("")).cast("int")

  /** Read a staging dir of event{code}_log.csv files (tab-separated, no
    * header — the reference's sysmon dump shape) with per-row lineage
    * (source file, line) and the file-name-derived event code.
    */
  def readStagingDir(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .csv(s"$dir/event*_log.csv")
      .withColumn("src_file", input_file_name())
      .withColumn("event_code", eventCodeFromFile(col("src_file")))
}
