package graft.types

import org.apache.spark.sql.types._

/** Iceberg-type-string <-> Spark DataType mapping.
  *
  * Mirrors the reference's 12-primitive-type table
  * (`dagster/lakehouse/utils/table_loader.py:52-68`,
  * `table-templates/_schema.json:34`), including the documented
  * unknown-type -> string fallback (`table_loader.py:68`). We additionally
  * map `decimal(p,s)` properly (documented in the reference schema but
  * unmapped there).
  *
  * Engine notes for scale: these are the only column types the engine
  * declares; all are Parquet-native and fully supported by Spark's
  * vectorized reader + whole-stage codegen, so declared-schema scans stay
  * columnar end to end.
  */
object IcebergTypes {

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r

  /** Iceberg type string -> Spark DataType. Unknown -> StringType (parity
    * with the reference's silent fallback).
    */
  def toSpark(t: String): DataType = t.trim.toLowerCase match {
    case "boolean"     => BooleanType
    case "int"         => IntegerType
    case "long"        => LongType
    case "float"       => FloatType
    case "double"      => DoubleType
    case "date"        => DateType
    // No native TIME type in Spark; mirror the Athena demotion to string
    // (`aws/modules/catalog_glue/locals.tf:3-16`).
    case "time"        => StringType
    case "timestamp"   => TimestampNTZType
    case "timestamptz" => TimestampType // session TZ pinned to UTC
    case "string"      => StringType
    case "uuid"        => StringType // demoted, as in the reference
    case "binary"      => BinaryType
    case DecimalRe(p, s) => DecimalType(p.toInt, s.toInt)
    case _             => StringType // documented fallback
  }

  /** Spark DataType -> canonical Iceberg type string (used by schema_diff
    * reporting and DDL generation). Inverse of [[toSpark]] where unambiguous.
    */
  def fromSpark(dt: DataType): String = dt match {
    case BooleanType      => "boolean"
    case IntegerType      => "int"
    case LongType         => "long"
    case FloatType        => "float"
    case DoubleType       => "double"
    case DateType         => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType    => "timestamptz"
    case StringType       => "string"
    case BinaryType       => "binary"
    case d: DecimalType   => s"decimal(${d.precision},${d.scale})"
    case other            => other.simpleString
  }

  /** Normalize engine-specific type spellings for drift comparison, the way
    * the reference normalizes Glue vs template types
    * (`sensors/schema_drift.py:13-33`): compare on canonical iceberg
    * strings, treating timestamp/timestamptz and int/long-width aliases
    * carefully but not conflating them.
    */
  def normalize(t: String): String = t.trim.toLowerCase match {
    case "bigint"               => "long"
    case "integer"              => "int"
    case "bool"                 => "boolean"
    case "varchar" | "text"     => "string"
    case "real"                 => "float"
    case "timestamp_ntz"        => "timestamp"
    case "timestamp_ltz"        => "timestamptz"
    case other                  => other
  }
}
