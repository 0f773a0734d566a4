package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (query set × corpus — the query set is
  * broadcast, so the corpus is scanned once with no shuffle). Scale path:
  * random-hyperplane LSH buckets (deterministic integer hyperplanes, exact
  * SQL twin) — the corpus is bucketed once, queries probe only their own
  * bucket, turning top-k from O(|Q|·|C|) into O(|Q|·|C|/2^bits).
  */
object Ann {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product (left-to-right, IEEE double → oracle-exact). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b))), 6)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). Deterministic tie-break on (cos desc, id).
    */
  def bruteForceTopK(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.where(queryFilter).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"))
    val scored = q.join(c, col("c_id") =!= col("q_id")) // broadcast(q) auto: q is tiny
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "cos", "rank")
  }

  /** Deterministic integer hyperplane j: component i (0-based) is
    * ((i+1)·(j+3)) mod 7 − 3 ∈ [−3, 3]. Pure arithmetic → identical in SQL.
    */
  def hyperplaneDot(v: Column, j: Int): Column =
    aggregate(
      zip_with(v, sequence(lit(1), size(v)),
        (x, i) => x * ((i.cast("long") * (j + 3)) % 7 - 3).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** LSH bucket id from `bits` sign bits. */
  def lshBucket(v: Column, bits: Int): Column =
    (0 until bits).map(j => when(hyperplaneDot(v, j) >= 0, lit(1L << j)).otherwise(0L))
      .reduce(_ + _)

  /** Deterministic integer centroid j for IVF: component i (1-based) is
    * (i·(j+1)) mod 5 − 2 ∈ [−2, 2]. Pure arithmetic → identical in SQL.
    */
  def centroidDot(v: Column, j: Int): Column =
    aggregate(
      zip_with(v, sequence(lit(1), size(v)),
        (x, i) => x * ((i.cast("long") * (j + 1)) % 5 - 2).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** IVF coarse cell: argmax over nCells centroid dot products (first max,
    * 1-based — matches SQL list_position(l, list_max(l))).
    */
  def ivfCell(v: Column, nCells: Int): Column = {
    val dots = array((0 until nCells).map(centroidDot(v, _)): _*)
    array_position(dots, array_max(dots)).cast("int")
  }

  /** IVF ANN: corpus coarse-quantized into nCells by nearest deterministic
    * centroid; each query probes only its own cell. The 100 TB shape: cells
    * are a partition key — candidate scan is |C|/nCells per query and the
    * cell assignment is one codegen'd pass; recall is tunable via nProbe
    * (here 1) against the brute-force baseline.
    */
  def ivfTopK(emb: DataFrame, queryFilter: Column, k: Int, nCells: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("cell", ivfCell(col("v"), nCells))
    val q = e.where(queryFilter).select(col("vec_id").as("q_id"), col("v").as("qv"), col("cell"))
    val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("cell"))
    val scored = q.join(c, Seq("cell")).where(col("c_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "cos", "rank", "cell")
  }

  /** Bucketed ANN: probe only the query's bucket. Recall < 1 by design —
    * the scale path; the brute-force baseline measures its recall.
    */
  def lshTopK(emb: DataFrame, queryFilter: Column, k: Int, bits: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), bits))
    val q = e.where(queryFilter).select(col("vec_id").as("q_id"), col("v").as("qv"), col("bucket"))
    val c = e.select(col("vec_id").as("c_id"), col("v").as("cv"), col("bucket"))
    val scored = q.join(c, Seq("bucket")).where(col("c_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "cos", "rank", "bucket")
  }
}
