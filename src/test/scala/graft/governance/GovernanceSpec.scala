package graft.governance

import graft.SparkSpec
import graft.template.TemplateLoader

class AuditSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("audit records carry the five-event taxonomy and reject others") {
    Audit.clear()
    val rec = Audit.log("table_read", "ns.t", Map("rows" -> "5"))
    assert(rec.event == "table_read")
    assert(Audit.recorded.last == rec)
    intercept[IllegalArgumentException](Audit.log("made_up_event", "ns.t"))
    Audit.clear()
  }

  test("audit records serialize as JSON with UTC ISO-8601 timestamps") {
    val rec = Audit.log("schema_drift", "ns.t", Map("a" -> "b\"c"))
    assert(rec.timestamp.endsWith("Z")) // ISO_INSTANT is always UTC
    assert(rec.toJson.contains("\"event\": \"schema_drift\""))
    assert(rec.toJson.contains("\\\"")) // quotes escaped
    Audit.clear()
  }
}

class AlertingSpec extends org.scalatest.funsuite.AnyFunSuite {

  val sns = Map("ALERT_SNS_TOPIC_ARN" -> "arn:x")
  val slack = Map("ALERT_SLACK_WEBHOOK_URL" -> "https://h/x")

  test("dispatches to every configured channel") {
    assert(Alerting.alert("s", "m", sns ++ slack).sorted == Seq("slack", "sns"))
    assert(Alerting.alert("s", "m", sns) == Seq("sns"))
    assert(Alerting.alert("s", "m", slack) == Seq("slack"))
  }

  test("no configured channel -> warn, empty dispatch") {
    assert(Alerting.alert("s", "m", Map.empty).isEmpty)
  }

  test("delivered alerts are recorded for assertion") {
    Alerting.clear()
    Alerting.alert("subj", "msg", sns)
    assert(Alerting.deliveredAlerts.exists(a => a.channel == "sns" && a.subject == "subj"))
    Alerting.clear()
  }
}

class AccessControlSpec extends SparkSpec {

  lazy val t = TemplateLoader.get("/root/repo/templates", "events")

  test("reader loses restricted columns; the drop is audited") {
    import spark.implicits._
    val df = Seq((1L, 2L, "x")).toDF("event_id", "user_id", "event_type")
    Audit.clear()
    val masked = AccessControl.maskPii(df, t, AccessControl.Reader)
    assert(!masked.columns.contains("user_id"))
    assert(Audit.recorded.exists(_.event == "pii_columns_dropped"))
    Audit.clear()
  }

  test("writer and admin see everything; no audit emitted") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("event_id", "user_id")
    Audit.clear()
    assert(AccessControl.maskPii(df, t, AccessControl.Writer).columns.contains("user_id"))
    assert(AccessControl.maskPii(df, t, AccessControl.Admin).columns.contains("user_id"))
    assert(Audit.recorded.isEmpty)
  }

  test("level resolves from session conf, then env, defaulting to admin") {
    spark.conf.set("graft.access.level", "reader")
    assert(AccessControl.resolve(spark) == AccessControl.Reader)
    spark.conf.set("graft.access.level", "writer")
    assert(AccessControl.resolve(spark) == AccessControl.Writer)
    spark.conf.unset("graft.access.level")
    assert(AccessControl.resolve(spark) == AccessControl.Admin)
  }

  test("unknown access levels fail CLOSED to reader, never admin") {
    for (typo <- Seq("readonly", "Read-er", "root", ""))  {
      spark.conf.set("graft.access.level", typo)
      assert(AccessControl.resolve(spark) == AccessControl.Reader, typo)
    }
    spark.conf.unset("graft.access.level")
  }

  test("team-namespace matrix: owning team + admin pass, everyone else refused") {
    import AccessControl._
    assert(namespaceOwner("team-ml").contains("ml"))
    assert(namespaceOwner("Team-ML").contains("ml"), "prefix match is case-insensitive")
    assert(namespaceOwner("lakehouse").isEmpty)
    assert(namespaceOwner("team-").isEmpty, "empty owner = not a team namespace")
    // shared namespaces are never restricted — no principal combination throws
    checkNamespaceAccess("lakehouse", "lakehouse.t", Reader, None)
    // owning team at any level passes; platform (admin) passes teamless
    checkNamespaceAccess("team-ml", "team-ml.t", Reader, Some("ml"))
    checkNamespaceAccess("team-ml", "team-ml.t", Writer, Some("ml"))
    checkNamespaceAccess("team-ml", "team-ml.t", Admin, None)
    // foreign team / teamless non-admin: refused with the remediation
    Audit.clear()
    val e = intercept[NamespaceAccessDenied] {
      checkNamespaceAccess("team-ml", "team-ml.t", Writer, Some("analytics"))
    }
    assert(e.getMessage.contains("restricted to team 'ml'"))
    assert(e.getMessage.contains("graft.access.team"), "message must carry the remediation")
    intercept[NamespaceAccessDenied] {
      checkNamespaceAccess("team-ml", "team-ml.t", Reader, None)
    }
    assert(Audit.recorded.count(ev =>
      ev.details.get("access").contains("denied")) == 2, "each denial audited")
    // an access review must distinguish refused reads from refused
    // mutations: a write-verb denial audits as table_write with the verb
    Audit.clear()
    intercept[NamespaceAccessDenied] {
      checkNamespaceAccess("team-ml", "team-ml.t", Writer, Some("analytics"), "write")
    }
    val wd = Audit.recorded.filter(_.details.get("access").contains("denied"))
    assert(wd.map(_.event) == Seq("table_write"),
      s"a refused write must audit as table_write, got ${wd.map(_.event)}")
    assert(wd.head.details.get("verb").contains("write"))
    Audit.clear()
  }

  test("team resolves from session conf, then env; normalized lowercase") {
    spark.conf.set("graft.access.team", "  ML ")
    assert(AccessControl.resolveTeam(spark).contains("ml"))
    spark.conf.set("graft.access.team", "")
    assert(AccessControl.resolveTeam(spark).isEmpty, "blank = no team principal")
    spark.conf.unset("graft.access.team")
    assert(AccessControl.resolveTeam(spark).isEmpty)
  }

  test("team config: typo'd levels and duplicate names fail the LOAD, not a later read") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_teams_bad")
    Files.writeString(dir.resolve("a.yaml"), "name: a\ntables:\n  t1: Writer\n")
    // levels normalize case-insensitively
    TeamConfig.invalidate()
    assert(TeamConfig.load(dir.toString)("a").tables("t1") == AccessControl.Writer)
    Files.writeString(dir.resolve("b.yaml"), "name: b\ntables:\n  t1: righter\n")
    TeamConfig.invalidate()
    val e = intercept[IllegalArgumentException](TeamConfig.load(dir.toString))
    assert(e.getMessage.contains("unknown access level 'righter'"), e.getMessage)
    Files.writeString(dir.resolve("b.yaml"), "name: a\ntables: {}\n")
    TeamConfig.invalidate()
    val e2 = intercept[IllegalArgumentException](TeamConfig.load(dir.toString))
    assert(e2.getMessage.contains("duplicate team name"), e2.getMessage)
    TeamConfig.invalidate()
  }

  test("team matrix enforces end-to-end through the SQL catalog") {
    import java.nio.file.Files
    import spark.implicits._
    val teamsDir = Files.createTempDirectory("graft_teams_e2e")
    Files.writeString(teamsDir.resolve("bi.yaml"),
      "name: bi\ntables:\n  tm: reader\n")
    val wh = Files.createTempDirectory("graft_teams_wh").toString
    graft.sink.SnapshotTable(wh, "ns", "tm")
      .overwrite(Seq((1L, "a")).toDF("id", "v")): Unit
    graft.sink.SnapshotTable(wh, "ns", "other")
      .overwrite(Seq((2L, "b")).toDF("id", "v")): Unit
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    TeamConfig.invalidate()
    spark.conf.set(TeamConfig.DirConfKey, teamsDir.toString)
    spark.conf.set("graft.access.team", "bi")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    try {
      // reader: SELECT works, INSERT / ALTER / an unlisted table do not
      assert(spark.sql("SELECT * FROM graft.ns.tm").count() == 1)
      val w = intercept[Exception](
        spark.sql("INSERT INTO graft.ns.tm VALUES (9L, 'z')"))
      assert(msgs(w).exists(_.contains("requires more than level 'reader'")), msgs(w))
      val a = intercept[Exception](
        spark.sql("ALTER TABLE graft.ns.tm ADD COLUMN extra STRING"))
      assert(msgs(a).exists(_.contains("'alter' requires")), msgs(a))
      // row-level DML is a write too: UPDATE/MERGE must not slip past
      // the matrix through their own lowering path
      val u = intercept[Exception](
        spark.sql("UPDATE graft.ns.tm SET v = 'x' WHERE id = 1"))
      assert(msgs(u).exists(_.contains("requires more than level 'reader'")), msgs(u))
      val mg = intercept[Exception](
        spark.sql("""MERGE INTO graft.ns.tm t USING (SELECT 1L AS id, 'y' AS v) s
                    |ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
      assert(msgs(mg).exists(_.contains("requires more than level 'reader'")), msgs(mg))
      val n = intercept[Exception](spark.sql("SELECT * FROM graft.ns.other").collect())
      assert(msgs(n).exists(_.contains("denied")),
        s"tables the team config omits default to none: ${msgs(n)}")
      // the table is untouched by the refused write
      assert(spark.sql("SELECT * FROM graft.ns.tm").count() == 1)
      // PII masking honors the PER-TABLE level: the same governed-read
      // masking that drops restricted columns for global readers drops
      // them for a team whose level on THIS table is reader
      val tpl = graft.template.TemplateLoader.get("/root/repo/templates", "events")
        .copy(name = "tm", namespace = "ns")
      val masked = AccessControl.maskPii(
        Seq((1L, 2L)).toDF("event_id", "user_id"), tpl, spark)
      assert(!masked.columns.contains("user_id"),
        "a reader-level team must lose restricted columns")
      // a none-level table refuses the masked read outright — masking is
      // not a substitute for denial
      val noneT = tpl.copy(name = "other")
      val d = intercept[AccessControl.TableAccessDenied] {
        AccessControl.maskPii(Seq((1L, 2L)).toDF("event_id", "user_id"), noneT, spark)
      }
      assert(d.getMessage.contains("denied"))
      // teamless operator session falls back to the global (admin) level
      spark.conf.unset("graft.access.team")
      spark.sql("INSERT INTO graft.ns.tm VALUES (9L, 'z')")
      assert(spark.sql("SELECT * FROM graft.ns.tm").count() == 2)
    } finally {
      spark.conf.unset("graft.access.team")
      spark.conf.unset(TeamConfig.DirConfKey)
      TeamConfig.invalidate()
    }
  }
}
