package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.template.PartitionField

/** The declared partition TRANSFORM spec of a table — `day(ts)`,
  * `bucket(16, id)`, ... — persisted beside the table metadata as
  * `.graft-partition-spec.json`. Iceberg keeps the same information in
  * its partition-spec metadata; here it serves the same two consumers:
  *
  *  - writers (template-driven [[TableSink]] writes and SQL
  *    `CREATE TABLE ... PARTITIONED BY` catalog writes) re-derive the
  *    directory columns from it in every session;
  *  - the read side's hidden-partitioning rule
  *    ([[graft.plans.GraftHiddenPartitionRule]]) translates predicates
  *    on the SOURCE column (`ts >= X`) into predicates on the derived
  *    directory column (`ts_day >= date(X)`) so partition pruning fires
  *    without the user ever naming the directory column — Iceberg's
  *    hidden-partitioning read contract.
  */
object DeclaredPartitionSpec {

  val FileName = ".graft-partition-spec.json"

  /** The derived directory-column name of one transform — must match
    * [[TableSink.transformColumn]]'s naming exactly.
    */
  def derivedName(p: PartitionField): String = p.transform match {
    case "identity" => p.column
    case "year"     => s"${p.column}_year"
    case "month"    => s"${p.column}_month"
    case "day"      => s"${p.column}_day"
    case "hour"     => s"${p.column}_hour"
    case "bucket"   => s"${p.column}_bucket"
    case "truncate" => s"${p.column}_trunc"
    case other      => throw new IllegalArgumentException(s"Unknown partition transform: $other")
  }

  def write(tableRoot: String, spec: Seq[PartitionField]): Unit = {
    val json = spec.map(p =>
      s"""{"column":"${p.column}","transform":"${p.transform}","n":${p.n}}""")
      .mkString("[", ",", "]")
    val path = Paths.get(tableRoot, FileName)
    // idempotent: template writes re-declare the same spec every commit
    val current =
      if (Files.exists(path)) new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
      else ""
    if (current != json) {
      Files.createDirectories(path.getParent)
      Files.write(path, json.getBytes(StandardCharsets.UTF_8)): Unit
    }
  }

  def read(tableRoot: String): Seq[PartitionField] = {
    val p = Paths.get(tableRoot, FileName)
    if (!Files.exists(p)) Nil
    else {
      val json = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      """\{"column":"([^"]+)","transform":"([^"]+)","n":(\d+)\}""".r
        .findAllMatchIn(json)
        .map(m => PartitionField(m.group(1), m.group(2), m.group(3).toInt))
        .toSeq
    }
  }
}
