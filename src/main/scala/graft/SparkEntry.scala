package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data ops)
  * has a `queries` entry; those expressible in ANSI SQL have a DuckDB twin
  * in `oracleSql` built from the exact same integer/string arithmetic so the
  * driver's hash compare matches value-for-value.
  */
object SparkEntry {

  private def prep(spark: SparkSession): SparkSession = {
    // non-ANSI: malformed field → NULL (the reference drops-and-counts bad
    // records, never aborts — /root/reference/src/collector/zeek.rs:118-139)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Flagship: full parse→dedup→enrich→route pipeline aggregate on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("p14_pipeline")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (QueriesPipeline.queries ++ QueriesOps.queries ++ QueriesProto.queries ++
      QueriesVendors.queries)
      .map { case (name, fn) =>
        name -> ((s: SparkSession, dir: String) => fn(prep(s), dir))
      }.toMap

  def oracleSql: Map[String, String] =
    QueriesPipeline.oracles ++ QueriesOps.oracles ++ QueriesProto.oracles ++
      QueriesVendors.oracles
}
