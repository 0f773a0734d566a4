package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, composed Spark-first
  * so Catalyst keeps optimizing them (no mapPartitions, no UDFs):
  *
  *  - [[asOf]]: each probe row joins the LATEST build row with
  *    `build.ts <= probe.ts` on the same key — config/version enrichment
  *    for event logs. Implemented as union + `last(_, ignoreNulls)` over a
  *    (key, ts)-ordered window: one shuffle on the key, window state
  *    bounded by one key's history, no non-equi join anywhere. DuckDB's
  *    native ASOF JOIN is the oracle twin.
  *
  *  - [[rangeJoin]]: each probe value joins the range [start, end]
  *    containing it — CIDR/interval enrichment. A naive non-equi join is
  *    a cross product; instead ranges explode into fixed-width blocks and
  *    the probe equi-joins on its block id, then filters the bound — the
  *    candidate set per probe is the ranges overlapping one block, O(1)
  *    for bounded-width ranges at ANY corpus size.
  */
object AsOf {

  /** As-of (backward) join. `probe` needs (key, ts, …); `build` needs
    * (key, ts, value). Build rows must be unique per (key, ts) — pre-dedup
    * upstream or ties make the result order-dependent. Probe rows before
    * any build row get NULL value (left semantics).
    *
    * `probeCols` are carried through; the effective build value is emitted
    * as `asof_<valueCol>`.
    */
  def asOf(probe: DataFrame, build: DataFrame, keyCol: String, tsCol: String,
           valueCol: String, probeCols: Seq[String]): DataFrame = {
    // tag sorts build rows BEFORE probe rows at equal ts: an update taking
    // effect at ts applies to events at the same ts (ASOF >= semantics).
    // The build value rides inside a one-field STRUCT marker: the struct is
    // non-null for every build row even when the value itself is NULL, so
    // `last(_, ignoreNulls)` matches a genuinely-NULL build value (yielding
    // NULL, like DuckDB's ASOF JOIN) instead of skipping that row and
    // carrying the previous config forward
    val vType = build.schema(valueCol).dataType
    val bCols = Seq(col(keyCol), col(tsCol), lit(0).as("__tag"),
      struct(col(valueCol).as("v")).as("__v")) ++
      probeCols.map(c => lit(null).cast(probe.schema(c).dataType).as(c))
    val pCols = Seq(col(keyCol), col(tsCol), lit(1).as("__tag"),
      lit(null).cast(org.apache.spark.sql.types.StructType(
        Seq(org.apache.spark.sql.types.StructField("v", vType)))).as("__v")) ++
      probeCols.map(col)
    val b = build.select(bCols: _*)
    val p = probe.select(pCols: _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("__eff", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(col(keyCol) +: col(tsCol) +: probeCols.map(col) :+
        col("__eff").getField("v").as(s"asof_$valueCol"): _*)
  }

  /** Range (interval) join. `probe` needs (value, …); `ranges` needs
    * (start, end, payload) with non-overlapping [start, end] intervals
    * (at most one match per probe — deterministic). Left semantics:
    * unmatched probes keep NULL payload.
    *
    * `blockSize` must be ≥ the widest range so each range spans ≤ 2
    * blocks; the equi-join key is the block id.
    */
  def rangeJoin(probe: DataFrame, ranges: DataFrame, valueCol: String,
                startCol: String, endCol: String, payloadCol: String,
                probeCols: Seq[String], blockSize: Long): DataFrame = {
    val rb = ranges
      .select(col(startCol), col(endCol), col(payloadCol),
        explode(sequence(floor(col(startCol) / blockSize),
          floor(col(endCol) / blockSize))).as("__blk"))
    val pb = probe.select(col(valueCol) +: probeCols.map(col): _*)
      .withColumn("__blk", floor(col(valueCol) / blockSize))
    pb.join(rb,
        pb("__blk") === rb("__blk") &&
          col(valueCol) >= col(startCol) && col(valueCol) <= col(endCol),
        "left")
      .select(col(valueCol) +: probeCols.map(col) :+ col(payloadCol): _*)
  }
}
