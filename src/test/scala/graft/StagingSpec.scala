package graft

import java.nio.file.{Files, Paths}

import graft.sources.Staging

/** File-name-derived routing over a staging dir (ES-dump analog):
  * `event{code}_log.csv` → event_code column; non-matching names ignored by
  * the glob; lineage (src_file) preserved per row.
  */
class StagingSpec extends SparkSpec {

  test("glob ingest derives event_code from file name, keeps lineage, one scan") {
    val dir = Files.createTempDirectory("graft-staging").toString
    Files.writeString(Paths.get(dir, "event1_log.csv"), "2023-10-15 04:05:06.000\tproc1.exe\n2023-10-15 04:05:07.000\tproc2.exe\n")
    Files.writeString(Paths.get(dir, "event11_log.csv"), "2023-10-15 04:05:08.000\tx.dll\n")
    Files.writeString(Paths.get(dir, "README.txt"), "not a staging file\n")

    val df = Staging.readStagingDir(spark, dir)
    val byCode = df.groupBy("event_code").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCode === Map(1 -> 2L, 11 -> 1L))
    assert(df.where(org.apache.spark.sql.functions.col("src_file").contains("event11_log")).count() === 1)
  }

  test("unparseable file names yield NULL event_code (skip semantics), not errors") {
    val dir = Files.createTempDirectory("graft-staging2").toString
    Files.writeString(Paths.get(dir, "eventX_log.csv"), "a\tb\n") // matches glob, not the code regex
    val df = Staging.readStagingDir(spark, dir)
    assert(df.count() === 1)
    assert(df.where("event_code IS NULL").count() === 1)
  }
}
