package graft.governance

import java.io.File
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Per-team table access configuration — the reference's teams-dir
  * YAML model (`docs/multi-tenancy.md:44-105`): one YAML per team
  * mapping table names to an access level, missing tables defaulting
  * to `none`. The documented level matrix:
  *
  * | level  | SELECT            | INSERT/DELETE | PII columns | ALTER |
  * |--------|-------------------|---------------|-------------|-------|
  * | none   | no                | no            | no          | no    |
  * | reader | public columns    | no            | excluded    | no    |
  * | writer | all columns       | yes           | full        | no    |
  * | admin  | all columns       | yes           | full        | yes   |
  *
  * The reference enforces this twice (IAM at the cloud layer, Dagster
  * team context at the application layer) from ONE config; this engine
  * enforces it at the catalog front door from the same shape. A typo'd
  * level fails the LOAD (fail fast at deploy), not some later read.
  */
object TeamConfig {

  final case class Team(
      name: String,
      description: String,
      tables: Map[String, AccessControl.Level],
      noAccess: Set[String])

  /** Session/env key locating the teams directory; unset = the per-team
    * matrix is not in force (the global access level governs alone).
    */
  val DirConfKey = "graft.access.teams-dir"
  val DirEnvKey = "LAKEHOUSE_TEAMS_DIR"

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, Team]]()

  def invalidate(): Unit = cache.clear()

  /** Load every `*.yaml` team file in `dir`, keyed by team name. */
  def load(dir: String): Map[String, Team] =
    cache.computeIfAbsent(dir, d => loadUncached(d))

  private def loadUncached(dir: String): Map[String, Team] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.endsWith(".yaml") || f.getName.endsWith(".yml"))
    val teams = files.toSeq.map(parseFile)
    val dup = teams.groupBy(_.name).collect { case (n, ts) if ts.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate team name(s) ${dup.mkString(", ")} across $dir/*.yaml")
    teams.map(t => t.name -> t).toMap
  }

  private[governance] def parseFile(f: File): Team = {
    val root = new Yaml().load[Any](Files.readString(f.toPath)) match {
      case m: java.util.Map[_, _] =>
        m.asScala.map { case (k, v) => k.toString -> v }.toMap
      case other =>
        throw new IllegalArgumentException(
          s"team file ${f.getName}: expected a YAML mapping, got $other")
    }
    val name = root.getOrElse("name",
      throw new IllegalArgumentException(s"team file ${f.getName} lacks 'name'"))
      .toString.trim.toLowerCase
    require(name.nonEmpty, s"team file ${f.getName}: 'name' is empty")
    val tables = root.get("tables") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v.toString.trim.toLowerCase }.toMap
      case None => Map.empty[String, String]
      case Some(other) =>
        throw new IllegalArgumentException(
          s"team file ${f.getName}: 'tables' must be a mapping, got $other")
    }
    val levels = tables.map { case (table, lvl) =>
      lvl match {
        case "none" => table -> None
        case "reader" => table -> Some(AccessControl.Reader)
        case "writer" => table -> Some(AccessControl.Writer)
        case "admin" => table -> Some(AccessControl.Admin)
        case other => throw new IllegalArgumentException(
          s"team file ${f.getName}: table '$table' declares unknown access " +
            s"level '$other' (allowed: none, reader, writer, admin)")
      }
    }
    Team(name,
      root.get("description").map(_.toString).getOrElse(""),
      levels.collect { case (t, Some(l)) => t -> l },
      levels.collect { case (t, None) => t }.toSet)
  }

  /** The teams directory in force for this session, if any. */
  def configuredDir(spark: org.apache.spark.sql.SparkSession): Option[String] =
    spark.conf.getOption(DirConfKey).orElse(sys.env.get(DirEnvKey))
      .map(_.trim).filter(_.nonEmpty)

  /** The session team's access level for ONE table under the per-table
    * matrix: None = no access (the documented default for tables a team
    * config omits, and for sessions with no/unknown team). Only
    * meaningful when a teams dir is configured.
    */
  def levelFor(
      dir: String, team: Option[String], table: String): Option[AccessControl.Level] =
    team.flatMap(load(dir).get).flatMap { t =>
      if (t.noAccess.contains(table)) None else t.tables.get(table)
    }
}
