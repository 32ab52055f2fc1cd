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

  /** Column names of nested (array/map/struct) fields — the cell types
    * the driver's pandas row-sort cannot order, so an oracle-keyed
    * registry output must have none. The ONE definition both Verify's
    * dump refusal and PlanSpec's registry gate consume.
    */
  def nestedColumns(schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    schema.fields.collect {
      case f if (f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      }) => f.name
    }.toSeq
  }

  def tbl(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts has shipped as INT64 TIMESTAMP(NANOS) (which Spark's
    // parquet reader rejects — read as long nanos, truncate to micros the
    // way DuckDB fetches TIMESTAMP_NS) and as plain TIMESTAMP(MICROS)
    // (read natively as TIMESTAMP_NTZ). Normalize BOTH to the session-tz
    // TimestampType every downstream query was built against: the cast is
    // value-identical under the UTC session both Verify and the specs pin.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => df
      }
    } else df
  }

  /** The full registry, assembled per module. */
  lazy val all: Map[String, QueryDef] =
    CoreQueries.defs ++ RelationalQueries.defs ++ PatternQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ SimilarityQueries.defs ++
      MetaQueries.defs ++ ExtQueries.defs ++ QualityQueries.defs
}
