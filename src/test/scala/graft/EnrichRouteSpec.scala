package graft

import org.apache.spark.sql.functions._

import graft.operators.{Enrich, Route}
import graft.sources.Tables

class EnrichRouteSpec extends SparkSpec {
  import spark.implicits._

  test("broadcast enrich: left join never drops or duplicates fact rows") {
    val facts = Tables.tokens(spark, Sf)
    val dim = Tables.sourceDim(spark, Sf)
    val enriched = Enrich.withDim(facts, dim, "source")
    assert(enriched.count() === facts.count())
    assert(enriched.where(col("vendor").isNull).count() === 0) // every source present
  }

  test("enrich plan is a BroadcastHashJoin (no shuffle)") {
    val plan = Enrich.withDim(Tables.tokens(spark, Sf), Tables.sourceDim(spark, Sf), "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }

  test("salted join equals plain join result") {
    val facts = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val dim = Seq(("a", "A"), ("b", "B")).toDF("k", "d")
    val plain = facts.join(dim, Seq("k"), "left").select("k", "v", "d")
    val salted = Enrich.salted(facts, dim, "k", col("v"), 4).select("k", "v", "d")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("routing: quarantine iff parse failed; sinks partition the rows") {
    val routed = Route.routed(graft.operators.Parse.parsed(Tables.rawEvents(spark, Sf)))
    assert(routed.where(col("sink") === "quarantine" && col("parse_ok")).count() === 0)
    assert(routed.where(col("sink") =!= "quarantine" && !col("parse_ok")).count() === 0)
    val sinks = routed.select("sink").distinct().as[String].collect().toSet
    assert(sinks === Set("oplog", "nginx", "fgt", "zeek", "quarantine"))
  }

  test("ensureSinks creates a directory per declared sink (header-even-if-empty)") {
    val base = java.nio.file.Files.createTempDirectory("graft-sinks").toString
    Route.ensureSinks(base, Seq("a", "b"))
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$base/sink=a")))
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(s"$base/sink=b")))
  }

  test("fanOut writes hive-partitioned sinks readable per-sink with pruning") {
    val base = java.nio.file.Files.createTempDirectory("graft-fan").toString
    val routed = Route.routed(graft.operators.Parse.parsed(Tables.rawEvents(spark, Sf)))
      .select("doc_id", "sink")
    Route.fanOut(routed, base, buckets = 4)
    val one = spark.read.parquet(base).where(col("sink") === "oplog")
    assert(one.count() === routed.where(col("sink") === "oplog").count())
    val total = spark.read.parquet(base).count()
    assert(total === routed.count())
  }
}
