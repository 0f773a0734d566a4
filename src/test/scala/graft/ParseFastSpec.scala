package graft

import org.apache.spark.sql.functions._

import graft.operators.{Parse, ParseFast}
import graft.sources.Tables

/** RegexpExtractStruct (custom codegen Expression) must be a drop-in for the
  * builtin regexp_extract bank: identical structs on every raw line
  * (including corrupt ones), and identical under both codegen and
  * interpreted eval paths.
  */
class ParseFastSpec extends SparkSpec {

  private def diff(fast: org.apache.spark.sql.Column, slow: org.apache.spark.sql.Column): Long = {
    val raw = Tables.rawEvents(spark, Sf).select(col("raw_line"))
    raw.select(fast.as("f"), slow.as("s")).where(col("f") =!= col("s")).count()
  }

  test("oplog fast == builtin on all raw lines (incl. corrupt)") {
    assert(diff(ParseFast.oplog(col("raw_line")), Parse.oplog(col("raw_line"))) === 0)
  }

  test("nginx fast == builtin on all raw lines") {
    assert(diff(ParseFast.nginx(col("raw_line")), Parse.nginx(col("raw_line"))) === 0)
  }

  test("interpreted eval path matches codegen (whole-stage codegen off)") {
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(diff(ParseFast.oplog(col("raw_line")), Parse.oplog(col("raw_line"))) === 0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("null-group regex yields empty string, not null") {
    import spark.implicits._
    val r = Seq("ab").toDF("l")
      .select(graft.functions.RegexpExtractStruct.of(col("l"), "(a)(x)?(b)", 3).as("m"))
      .select("m.g1", "m.g2", "m.g3", "m.matched")
      .as[(String, String, String, Boolean)].head()
    assert(r === (("a", "", "b", true)))
  }
}
