package graft.governance

import graft.template.TableTemplate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Role model + PII masking projection.
  *
  * Reference semantics: `LAKEHOUSE_ACCESS_LEVEL=reader` drops every column
  * whose template `access_level == "restricted"` on read, and audits the
  * drop (`resources/iceberg.py:132-152`); role matrix reader/writer/admin
  * (`docs/architecture.md:147-158`). We key off Spark session config
  * `graft.access.level` first, then the environment, defaulting to admin.
  *
  * Scale note: the mask is a plain negative projection, so Catalyst folds
  * it into column pruning — restricted columns are never read off disk.
  */
object AccessControl {

  sealed trait Level { def name: String }
  case object Reader extends Level { val name = "reader" }
  case object Writer extends Level { val name = "writer" }
  case object Admin extends Level { val name = "admin" }

  def resolve(spark: SparkSession): Level = {
    spark.conf.getOption("graft.access.level")
      .orElse(sys.env.get("LAKEHOUSE_ACCESS_LEVEL")) match {
      case None => Admin // unconfigured = operator session (reference default)
      case Some(level) => level.toLowerCase match {
        case "reader" => Reader
        case "writer" => Writer
        case "admin"  => Admin
        // fail CLOSED: a typo'd level must not silently grant PII access
        case other =>
          org.slf4j.LoggerFactory.getLogger("lakehouse.access")
            .warn(s"Unknown access level '$other'; treating as reader (least privilege)")
          Reader
      }
    }
  }

  /** `project_pii_mask`: drop restricted columns for reader principals.
    * No-op for writer/admin. Audits `pii_columns_dropped` when it fires.
    */
  def maskPii(df: DataFrame, template: TableTemplate, level: Level): DataFrame =
    level match {
      case Reader =>
        val restricted = template.restrictedColumns.filter(df.columns.contains)
        if (restricted.isEmpty) df
        else {
          Audit.log(
            "pii_columns_dropped",
            template.fullName,
            Map("columns" -> restricted.sorted.mkString(","), "access_level" -> level.name))
          df.drop(restricted: _*)
        }
      case _ => df
    }

  /** Session-resolved masking. Under a configured teams dir the
    * PER-TABLE effective level governs (the doc matrix: a team reading
    * at `reader` loses restricted columns on THIS table even if it is
    * `writer` elsewhere); a `none` table fails the read outright —
    * masking is not a substitute for denial.
    */
  def maskPii(df: DataFrame, template: TableTemplate, spark: SparkSession): DataFrame =
    effectiveLevel(spark, template.name) match {
      case Some(lvl) => maskPii(df, template, lvl)
      case None =>
        throw TableAccessDenied(template.fullName, "read", "none",
          resolveTeam(spark).getOrElse("<none>"))
    }

  /** Team principal of the session: `graft.access.team` session conf
    * first, then the `LAKEHOUSE_TEAM` environment (the reference's
    * per-team Dagster instances each carry a team name in their env,
    * `docs/multi-tenancy.md` onboarding step 3).
    */
  def resolveTeam(spark: SparkSession): Option[String] =
    spark.conf.getOption("graft.access.team")
      .orElse(sys.env.get("LAKEHOUSE_TEAM"))
      .map(_.trim.toLowerCase).filter(_.nonEmpty)

  /** `team-{name}` namespaces are team-scoped (docs/multi-tenancy.md
    * §Shared Tables vs Team Tables, Option A).
    */
  val TeamNamespacePrefix = "team-"

  /** Owning team of a team-scoped namespace; None for shared ones. */
  def namespaceOwner(namespace: String): Option[String] =
    Some(namespace.toLowerCase).filter(_.startsWith(TeamNamespacePrefix))
      .map(_.stripPrefix(TeamNamespacePrefix)).filter(_.nonEmpty)

  /** Denied team-namespace access. Fails CLOSED with the remediation. */
  final case class NamespaceAccessDenied(namespace: String, table: String, principal: String)
    extends RuntimeException(
      s"Access to $table denied: namespace '$namespace' is restricted to " +
        s"team '${namespace.stripPrefix(TeamNamespacePrefix)}' and platform " +
        s"(admin) principals; this session is $principal. Set " +
        "graft.access.team to the owning team, use an admin session, or " +
        "ask the owning team to publish into a shared namespace")

  /** Namespace-scoped access matrix (`docs/multi-tenancy.md:347-354`):
    * a `team-<owner>` namespace is restricted to the owning team plus
    * platform (admin) principals — automatically, with no per-table
    * policy to forget. Shared namespaces are untouched. Enforced at the
    * catalog front door, so every SQL read/write/DDL route is covered;
    * denials are audited (a refused attempt is the audit event that
    * matters most in an access review).
    */
  def checkNamespaceAccess(
      namespace: String, table: String, level: Level, team: Option[String],
      verb: String = "resolve"): Unit =
    namespaceOwner(namespace).foreach { owner =>
      if (level != Admin && !team.contains(owner)) {
        val principal = s"level=${level.name}, team=${team.getOrElse("<none>")}"
        // denial audited under the event matching the refused VERB
        // (within the closed 5-event taxonomy: mutations → table_write),
        // with the verb itself in details — an access review must be
        // able to tell refused reads from refused writes. "resolve" =
        // statement shape unknown at the catalog front door.
        Audit.log(deniedEvent(verb), table, Map(
          "access" -> "denied", "verb" -> verb, "namespace" -> namespace,
          "access_level" -> level.name, "team" -> team.getOrElse("")))
        throw NamespaceAccessDenied(namespace, table, principal)
      }
    }

  /** Audit event name for a denied `verb` — the closed taxonomy has no
    * table_alter, so every refused mutation (write, alter, drop) audits
    * as table_write and the exact verb rides in details.
    */
  private def deniedEvent(verb: String): String =
    if (verb == "read" || verb == "resolve") "table_read" else "table_write"

  /** [[checkNamespaceAccess]] with the session's resolved principal. */
  def checkNamespaceAccess(namespace: String, table: String, spark: SparkSession): Unit =
    checkNamespaceAccess(namespace, table, resolve(spark), resolveTeam(spark), "resolve")

  /** [[checkNamespaceAccess]] with the session's resolved principal and
    * an explicit verb (so the denial audits under the right event).
    */
  def checkNamespaceAccess(namespace: String, table: String, spark: SparkSession,
      verb: String): Unit =
    checkNamespaceAccess(namespace, table, resolve(spark), resolveTeam(spark), verb)

  /** The session's access level for ONE table. With a teams directory
    * configured ([[TeamConfig.DirConfKey]]) and a team principal set,
    * the per-team per-table matrix governs — including `none` (returned
    * as None = no access at all) for tables the team's config omits and
    * for unknown team names (fail CLOSED). Teamless sessions — the
    * operator shape — and sessions without a teams dir fall back to the
    * global level.
    */
  def effectiveLevel(spark: SparkSession, table: String): Option[Level] =
    TeamConfig.configuredDir(spark) match {
      case Some(dir) =>
        resolveTeam(spark) match {
          case Some(team) => TeamConfig.levelFor(dir, Some(team), table)
          case None => Some(resolve(spark))
        }
      case None => Some(resolve(spark))
    }

  /** Denied per-table access under the team matrix. */
  final case class TableAccessDenied(
      table: String, verb: String, level: String, team: String)
    extends RuntimeException(
      s"Access to $table denied: '$verb' requires more than level '$level' " +
        s"for team '$team' (matrix: none < reader < writer < admin; see the " +
        "teams directory's YAML for this team). Raise the table's declared " +
        "level in the team config, or use a session with the owning team")

  /** Verb-level enforcement of the per-team table matrix
    * (`docs/multi-tenancy.md` §3 Access Levels Per Table): read needs
    * reader+, write (INSERT/DELETE/MERGE/TRUNCATE) needs writer+, alter
    * (schema/properties/drop) needs admin. No-op when no teams dir is
    * in force. Denials are audited.
    */
  def checkTableAccess(
      spark: SparkSession, table: String, fullName: String, verb: String): Unit =
    if (TeamConfig.configuredDir(spark).isDefined) {
      val lvl = effectiveLevel(spark, table)
      val ok = (lvl, verb) match {
        case (None, _) => false
        case (Some(_), "read") => true
        case (Some(Reader), _) => false
        case (Some(Writer), "alter") => false
        case (Some(_), _) => true
      }
      if (!ok) {
        val team = resolveTeam(spark).getOrElse("<none>")
        Audit.log(deniedEvent(verb), fullName, Map(
          "access" -> "denied", "verb" -> verb,
          "team" -> team, "level" -> lvl.map(_.name).getOrElse("none")))
        throw TableAccessDenied(fullName, verb, lvl.map(_.name).getOrElse("none"), team)
      }
    }

  /** Property key of the row-level policy for one access level. */
  def rowFilterKey(level: Level): String = s"access.row-filter.${level.name}"

  /** Row-level access policy: the `access.row-filter.<level>` TABLE
    * property declares a SQL predicate appended to every governed read
    * for principals at exactly that level (no property = no filter;
    * levels are independent — an admin is never filtered by the reader
    * policy). The policy is a plain Catalyst predicate, so pushdown and
    * partition pruning apply to it like any user filter — at 100 TB a
    * region- or date-scoped policy prunes the scan rather than
    * post-filtering it. Application is audited. Complements
    * [[maskPii]]'s column-level masking.
    */
  def rowFilter(
      df: DataFrame,
      properties: Map[String, String],
      tableName: String,
      level: Level): DataFrame =
    properties.get(rowFilterKey(level)) match {
      case Some(pred) =>
        // the event taxonomy is the reference's closed 5-event set; a
        // governed filtered read IS a table_read, annotated with the policy
        Audit.log("table_read", tableName,
          Map("access_level" -> level.name, "row_filter" -> pred))
        df.filter(org.apache.spark.sql.functions.expr(pred))
      case None => df
    }
}
