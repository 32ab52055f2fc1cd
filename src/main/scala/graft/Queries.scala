package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered, driver-verifiable query per operator key from
  * SURVEY.md §2 (+ the north-star LLM-pipeline operators). Each entry is a
  * `(SparkSession, sfDir) => DataFrame` plus, where SQL-expressible, an
  * equivalent DuckDB oracle statement over the same parquet tables.
  *
  * Determinism rules (SURVEY.md §7.4): no now() — fixed literals for
  * freshness/as-of; money aggregates via DECIMAL casts so Spark and DuckDB
  * sums are bit-identical; every ranking has a total tie-break.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Queries {

  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is physically INT64 TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects; read it as long nanos and restore a micros timestamp
    // (same truncation DuckDB applies when fetching TIMESTAMP_NS).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** The full registry, assembled per module. */
  lazy val all: Map[String, QueryDef] =
    CoreQueries.defs ++ RelationalQueries.defs ++ PatternQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MetaQueries.defs ++ ExtQueries.defs ++ QualityQueries.defs
}
