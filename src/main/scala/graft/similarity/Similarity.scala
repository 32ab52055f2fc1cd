package graft.similarity

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers, mirroring a production ANN stack:
  *  - `bruteForceTopK` — exact cosine top-k for a SMALL query set against
  *    the full corpus. The query side is broadcast, so the corpus streams
  *    once with no shuffle; ranking shuffles only (query_id, vec_id,
  *    score) triples, never vectors.
  *  - `lshTopK` — random-hyperplane LSH: each vector gets a J-bit bucket
  *    signature (sign of J fixed pseudo-random projections); queries only
  *    compare against corpus vectors in the SAME bucket. This is the
  *    scale path: the corpus-side work drops from O(|Q|·N) to
  *    O(collisions), and the bucket join is a plain equi-shuffle that
  *    partitions the corpus once. The hyperplanes are deterministic
  *    integer grids so the DuckDB oracle reproduces buckets exactly
  *    (production would use seeded gaussians).
  *
  * At 100 TB the same shape becomes IVF: bucket = coarse-centroid id from
  * a trained quantizer, signatures precomputed and stored as a column.
  */
object Similarity {

  /** Number of hyperplanes = signature bits. */
  val Planes = 8
  /** Deterministic integer hyperplane weight for (plane j, 1-based dim i). */
  private def weight(j: Int, i: Column): Column =
    (lit(j * 31) + (i - 1) * 17) % 7 - 3

  /** Cast a float embedding to double (exact widening). */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  /** Signed projection of `v` (1-based double array, dim `d`) on plane j. */
  private def projection(v: Column, j: Int, d: Int): Column =
    aggregate(sequence(lit(1), lit(d)), lit(0.0),
      (acc, i) => acc + element_at(v, i) * weight(j, i).cast("double"))

  /** LSH bucket id: J sign bits packed into a long. */
  def bucket(v: Column, d: Int): Column =
    (0 until Planes).map(j => when(projection(v, j, d) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact cosine top-k of each query vector against the corpus.
    * `queries`/`corpus`: (vec_id, embedding). Scores rounded to 4 dp with
    * vec_id tie-break so ranking is stable across engines and partitions.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(Dedup.cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }

  /** ANN top-k: compare only within matching LSH buckets. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, dim: Int, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("qv"))
      .withColumn("qb", bucket(col("qv"), dim))
    val c = corpus.select(col("vec_id"), asDouble(col("embedding")).as("cv"))
      .withColumn("cb", bucket(col("cv"), dim))
    val scored = c.join(broadcast(q),
        col("qb") === col("cb") && col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(Dedup.cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "cos", "rank")
  }
}
