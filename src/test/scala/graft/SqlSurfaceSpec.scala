package graft

import graft.sources.{SqlSurface, Tables}

/** The pure-SQL surface drives the same engine: custom functions resolve
  * by name, derived views carry the parse logic, and a SQL join+aggregate
  * over them matches the DataFrame path exactly.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql reaches tables, parsed views, and custom functions") {
    SqlSurface.register(spark, Sf)
    // custom codegen Expression resolves by name in SQL
    val fp = spark.sql(
      "SELECT doc_id, token_fingerprint(tokens) AS fp FROM tokens ORDER BY doc_id LIMIT 5")
      .collect()
    assert(fp.length === 5 && fp.forall(!_.isNullAt(1)))
    // parsed view carries the full parse stage; counts match the DataFrame path
    val sqlCounts = spark.sql(
      "SELECT kind, count(*) AS n FROM parsed_events WHERE parse_ok GROUP BY kind")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfCounts = {
      import org.apache.spark.sql.functions._
      graft.operators.Parse.parsed(Tables.rawEvents(spark, Sf))
        .where(col("parse_ok")).groupBy("kind").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(sqlCounts === dfCounts && sqlCounts.nonEmpty)
    // cross-view SQL join (dimension enrich) runs end-to-end
    val joined = spark.sql(
      """SELECT d.vendor, count(*) AS n FROM parsed_events p
        |JOIN source_dim d USING (source) GROUP BY d.vendor""".stripMargin).collect()
    assert(joined.nonEmpty)
  }
}
