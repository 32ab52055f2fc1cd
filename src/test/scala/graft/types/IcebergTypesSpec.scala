package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The 12-type parametrized mapping table, mirroring the reference's
  * `test_table_loader.py:103-128` (incl. unknown -> string fallback).
  */
class IcebergTypesSpec extends AnyFunSuite {

  val mappings: Seq[(String, DataType)] = Seq(
    "boolean" -> BooleanType,
    "int" -> IntegerType,
    "long" -> LongType,
    "float" -> FloatType,
    "double" -> DoubleType,
    "date" -> DateType,
    "time" -> StringType, // demoted, as Athena does
    "timestamp" -> TimestampNTZType,
    "timestamptz" -> TimestampType,
    "string" -> StringType,
    "uuid" -> StringType, // demoted
    "binary" -> BinaryType)

  for ((iceberg, spark) <- mappings)
    test(s"maps $iceberg -> $spark") {
      assert(IcebergTypes.toSpark(iceberg) == spark)
    }

  test("decimal(p,s) maps to DecimalType (improvement over reference's gap)") {
    assert(IcebergTypes.toSpark("decimal(18,2)") == DecimalType(18, 2))
    assert(IcebergTypes.toSpark("decimal( 7 , 3 )") == DecimalType(7, 3))
  }

  test("unknown types silently fall back to string (reference parity)") {
    assert(IcebergTypes.toSpark("wibble") == StringType)
    assert(IcebergTypes.toSpark("struct<a:int>") == StringType)
  }

  test("fromSpark round-trips the unambiguous types") {
    for ((ice, sp) <- mappings if !Seq("time", "uuid").contains(ice))
      assert(IcebergTypes.normalize(IcebergTypes.fromSpark(sp)) ==
        IcebergTypes.normalize(ice))
  }

  test("normalize folds engine aliases") {
    assert(IcebergTypes.normalize("BIGINT") == "long")
    assert(IcebergTypes.normalize("timestamp_ntz") == "timestamp")
    assert(IcebergTypes.normalize("varchar") == "string")
    assert(IcebergTypes.normalize("double") == "double")
  }
}
