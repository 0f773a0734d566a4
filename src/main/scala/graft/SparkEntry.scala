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
    // AQE partition-coalescing floor: the 1 MB default folds byte-SMALL but
    // compute-DENSE stages (d22's array_intersect verify, the ANN sketch
    // chains) into one task — bytes are the wrong proxy for compute there
    // (guide §2.2: size partitions by work, not only bytes). 64 KB keeps
    // those stages parallel; at cluster scale the advisory size (below)
    // still bounds partition count, so this only moves the tiny-stage floor.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "65536"))
    // match the engine's own Sessions.local broadcast threshold (64 MB) so
    // the driver-created bench/verify session plans the same joins the dev
    // sessions plan (guide §3.1: broadcast the side that fits — estimates
    // at the 10 MB default flip small model/frequency tables to shuffles)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", (64L << 20).toString))
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
