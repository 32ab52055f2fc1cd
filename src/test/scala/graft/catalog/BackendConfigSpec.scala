package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

/** Mirror of the reference's backend config matrix
  * (`tests/test_iceberg.py:6-72`): glue / nessie / gcp / invalid / default.
  */
class BackendConfigSpec extends AnyFunSuite {

  test("aws-glue resolves the Glue catalog with S3 IO") {
    val b = BackendConfig.resolve(Map("LAKEHOUSE_BACKEND" -> "aws-glue"))
    assert(b.catalogImpl == "glue")
    assert(b.conf("spark.sql.catalog.lakehouse.catalog-impl").contains("GlueCatalog"))
    assert(b.conf("spark.sql.catalog.lakehouse.io-impl").contains("S3FileIO"))
  }

  test("aws-nessie resolves the Nessie catalog with uri + ref from env") {
    val b = BackendConfig.resolve(Map(
      "LAKEHOUSE_BACKEND" -> "aws-nessie", "NESSIE_URI" -> "http://x:19120/api/v2",
      "NESSIE_REF" -> "dev"))
    assert(b.conf("spark.sql.catalog.lakehouse.uri") == "http://x:19120/api/v2")
    assert(b.conf("spark.sql.catalog.lakehouse.ref") == "dev")
  }

  test("gcp resolves the REST catalog against a gs:// warehouse") {
    val b = BackendConfig.resolve(Map("LAKEHOUSE_BACKEND" -> "gcp"))
    assert(b.catalogImpl == "rest")
    assert(b.conf("spark.sql.catalog.lakehouse.warehouse").startsWith("gs://"))
  }

  test("missing env defaults to aws-glue (reference default)") {
    assert(BackendConfig.resolve(Map.empty).name == "aws-glue")
  }

  test("unknown backend raises, naming the supported set") {
    val e = intercept[IllegalArgumentException](
      BackendConfig.resolve(Map("LAKEHOUSE_BACKEND" -> "azure")))
    assert(e.getMessage.contains("azure"))
    assert(e.getMessage.contains("aws-glue, aws-nessie, gcp"))
  }

  test("warehouse override propagates to every backend") {
    for (be <- BackendConfig.Known) {
      val b = BackendConfig.resolve(Map(
        "LAKEHOUSE_BACKEND" -> be, "LAKEHOUSE_WAREHOUSE" -> "s3://custom/wh/"))
      assert(b.conf("spark.sql.catalog.lakehouse.warehouse") == "s3://custom/wh/", be)
    }
  }
}
