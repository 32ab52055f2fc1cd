package graft.catalog

/** Catalog backend selection — the engine equivalent of the reference's
  * `LAKEHOUSE_BACKEND` dispatch (`dagster/lakehouse/resources/iceberg.py:18-40`;
  * test matrix `tests/test_iceberg.py:6-72`): `aws-glue` -> Glue catalog,
  * `aws-nessie` -> Nessie REST catalog, `gcp` -> BigLake/REST, default
  * `aws-glue`, unknown value -> actionable error.
  *
  * Output is the `spark.sql.catalog.*` configuration an Iceberg-enabled
  * Spark session would receive. This image ships no Iceberg runtime jar
  * (SURVEY.md §7.4), so the engine runs in parquet-mode (SnapshotTable)
  * and this resolver is config plumb-through: interface-complete,
  * validated by the same matrix the reference tests.
  */
object BackendConfig {

  final case class Backend(
      name: String,
      catalogImpl: String,
      conf: Map[String, String])

  val CatalogName = "lakehouse"
  val DefaultBackend = "aws-glue"
  val Known: Seq[String] = Seq("aws-glue", "aws-nessie", "gcp")

  def resolve(env: Map[String, String] = sys.env): Backend = {
    val backend = env.getOrElse("LAKEHOUSE_BACKEND", DefaultBackend)
    val base = s"spark.sql.catalog.$CatalogName"
    backend match {
      case "aws-glue" =>
        Backend(backend, "glue", Map(
          base -> "org.apache.iceberg.spark.SparkCatalog",
          s"$base.catalog-impl" -> "org.apache.iceberg.aws.glue.GlueCatalog",
          s"$base.warehouse" -> env.getOrElse("LAKEHOUSE_WAREHOUSE", "s3://lakehouse-warehouse/"),
          s"$base.io-impl" -> "org.apache.iceberg.aws.s3.S3FileIO"))
      case "aws-nessie" =>
        Backend(backend, "nessie", Map(
          base -> "org.apache.iceberg.spark.SparkCatalog",
          s"$base.catalog-impl" -> "org.apache.iceberg.nessie.NessieCatalog",
          s"$base.uri" -> env.getOrElse("NESSIE_URI", "http://nessie:19120/api/v2"),
          s"$base.ref" -> env.getOrElse("NESSIE_REF", "main"),
          s"$base.warehouse" -> env.getOrElse("LAKEHOUSE_WAREHOUSE", "s3://lakehouse-warehouse/")))
      case "gcp" =>
        Backend(backend, "rest", Map(
          base -> "org.apache.iceberg.spark.SparkCatalog",
          s"$base.catalog-impl" -> "org.apache.iceberg.rest.RESTCatalog",
          s"$base.uri" -> env.getOrElse("BIGLAKE_URI", "https://biglake.googleapis.com/iceberg/v1"),
          s"$base.warehouse" -> env.getOrElse("LAKEHOUSE_WAREHOUSE", "gs://lakehouse-warehouse/")))
      case other =>
        throw new IllegalArgumentException(
          s"Unknown LAKEHOUSE_BACKEND '$other'. " +
            s"Supported backends: ${Known.mkString(", ")}.")
    }
  }
}
