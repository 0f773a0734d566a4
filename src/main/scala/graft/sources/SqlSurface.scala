package graft.sources

import org.apache.spark.sql.SparkSession

/** SQL surface: registers every core table, the derived raw/parsed views,
  * and the custom functions as temp views/functions, so the whole engine
  * is drivable from `spark.sql(...)` — the API form a SQL-first user of
  * the reference would reach for. Views are lazy (a view not queried costs
  * nothing); parse/enrich logic stays the single Scala implementation
  * underneath, so SQL and DataFrame callers can never diverge.
  */
object SqlSurface {

  def register(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Seq("documents", "embeddings", "events", "lineitem", "orders",
      "customer", "nation", "region", "supplier", "part")
      .foreach(n => Tables.read(spark, dir, n).createOrReplaceTempView(n))
    Tables.tokens(spark, dir).createOrReplaceTempView("tokens")
    Tables.sourceDim(spark, dir).createOrReplaceTempView("source_dim")
    Tables.rawEvents(spark, dir).createOrReplaceTempView("raw_events")
    graft.operators.Parse.parsed(Tables.rawEvents(spark, dir))
      .createOrReplaceTempView("parsed_events")
  }
}
