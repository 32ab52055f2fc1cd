package graft.source

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The avro-core-backed FileFormat: full round-trip fidelity, nulls,
  * nested types, column pruning, and schema-evolution reads — the
  * spark-avro-module role on this distribution's classpath.
  */
class AvroFormatSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_avro").resolve("t").toString

  test("avro round-trips every supported type bit-exactly, nulls included") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("s", StringType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("bin", BinaryType),
      StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(18, 2)),
      StructField("arr", ArrayType(DoubleType)),
      StructField("st", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))))))
    val rows = Seq(
      Row(1L, 42, "héllo", 2.5, 1.5f, true, Array[Byte](1, 2, 3),
        java.sql.Date.valueOf("2024-02-29"),
        java.sql.Timestamp.valueOf("2024-01-15 10:30:00.123456"),
        new java.math.BigDecimal("12345678901234.56"),
        Seq(1.0, -2.25), Row(7L, "n")),
      Row(2L, null, null, null, null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    df.write.format("avro").save(dir)
    val back = spark.read.format("avro").load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    val exp = df.orderBy("id").collect()
    assert(got.length == 2)
    // binary needs element-wise compare; everything else compares directly
    (got zip exp).foreach { case (g, e) =>
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        (f.dataType, g.get(i), e.get(i)) match {
          case (BinaryType, gb: Array[Byte], eb: Array[Byte]) =>
            assert(gb.toSeq == eb.toSeq, f.name)
          case (_, gv, ev) => assert(gv == ev, s"${f.name}: $gv != $ev")
        }
      }
    }
  }

  test("avro reads prune columns and serve count()s; missing columns read null") {
    val dir = tmp()
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")
      .write.format("avro").save(dir)
    val pruned = spark.read.format("avro").load(dir).select("name")
    assert(pruned.as[String].collect().sorted.toSeq == Seq("a", "b"))
    assert(spark.read.format("avro").load(dir).count() == 2L)
    // schema-evolution read: ask for a column the files lack
    val evolved = StructType(Seq(
      StructField("id", LongType), StructField("extra", StringType)))
    val got = spark.read.format("avro").schema(evolved).load(dir)
      .orderBy("id").collect()
    assert(got.map(_.get(1)).forall(_ == null))
  }

  test("foreign producers' nested record names resolve (reader schema pruned from the writer)") {
    // simulate another producer (e.g. spark-avro): nested records named
    // and namespaced DIFFERENTLY than this format's own synthesized
    // names — avro resolution matches records by FULL NAME, so the
    // reader schema must take the writer's names, not invent its own
    import org.apache.avro.{Schema => A}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val nested = A.createRecord("st", null, "some.other.producer", false)
    nested.setFields(java.util.Arrays.asList(
      new A.Field("x", A.create(A.Type.LONG), null.asInstanceOf[String]),
      new A.Field("y", A.create(A.Type.STRING), null.asInstanceOf[String])))
    val top = A.createRecord("topLevelRecord", null, "", false)
    top.setFields(java.util.Arrays.asList(
      new A.Field("id", A.create(A.Type.LONG), null.asInstanceOf[String]),
      new A.Field("st",
        A.createUnion(A.create(A.Type.NULL), nested), null, A.Field.NULL_DEFAULT_VALUE)))
    val dir = Files.createTempDirectory("graft_avro_foreign")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](top))
    w.create(top, dir.resolve("part-0.avro").toFile)
    Seq((1L, 10L, "a"), (2L, 20L, "b")).foreach { case (id, x, y) =>
      val n = new GenericData.Record(nested)
      n.put("x", x); n.put("y", y)
      val r = new GenericData.Record(top)
      r.put("id", id); r.put("st", n)
      w.append(r)
    }
    w.close()
    val back = spark.read.format("avro").load(dir.toString)
    // full read AND a pruned nested projection must both resolve
    assert(back.count() == 2L)
    assert(back.select(col("id"), col("st.y")).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("avro schema-resolution promotions survive pruning (int file read as long/double)") {
    // a WIDER user schema over a narrower writer must promote via avro
    // resolution (int→long, int→double), not hand the row converter a
    // narrower runtime class than the projection expects
    import org.apache.avro.{Schema => A}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.file.DataFileWriter
    val top = A.createRecord("r", null, "p", false)
    top.setFields(java.util.Arrays.asList(
      new A.Field("id", A.create(A.Type.INT), null.asInstanceOf[String]),
      new A.Field("v", A.create(A.Type.FLOAT), null.asInstanceOf[String])))
    val dir = Files.createTempDirectory("graft_avro_promote")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](top))
    w.create(top, dir.resolve("part-0.avro").toFile)
    Seq((7, 1.5f), (8, 2.5f)).foreach { case (i, v) =>
      val r = new GenericData.Record(top)
      r.put("id", i); r.put("v", v)
      w.append(r)
    }
    w.close()
    val wide = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val got = spark.read.format("avro").schema(wide).load(dir.toString)
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(got == Seq((7L, 1.5), (8L, 2.5)))
  }

  test("avro write rejects unsupported column types actionably") {
    val df = Seq((1L, Map("k" -> 1))).toDF("id", "m")
    val e = intercept[Exception](df.write.format("avro").save(tmp()))
    assert(e.getMessage.contains("avro") || e.getMessage.contains("support"),
      e.getMessage)
  }

  test("snapshot tables write and read avro end to end") {
    val t = graft.sink.SnapshotTable(
      Files.createTempDirectory("graft_avro_t").toString, "ns", "t")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    t.overwrite(df, format = "avro")
    assert(t.currentSnapshot.get.format == "avro")
    t.append(Seq((3L, "c", 3.5)).toDF("id", "name", "v"), format = "avro")
    assert(t.read(spark).orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5)))
    // equality delete anti-joins through the avro read path too
    t.deleteWhere(Seq(2L).toDF("id"), Seq("id"))
    assert(t.read(spark).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }
}
