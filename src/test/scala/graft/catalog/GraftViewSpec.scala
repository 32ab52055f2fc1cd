package graft.catalog

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.sink.SnapshotTable
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Saved views (named queries) through the SQL front door and the
  * DSv2 ViewCatalog API: CREATE/DROP/SHOW VIEW, read expansion with
  * bare-name scoping, time travel THROUGH a view, nesting + recursion
  * detection, catalog-reload persistence, and collision guards.
  */
class GraftViewSpec extends SparkSpec {

  import spark.implicits._

  private def freshCatalog(key: String): String = {
    val wh = Files.createTempDirectory(s"graft_view_$key").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    wh
  }

  private def people(wh: String): SnapshotTable = {
    val t = SnapshotTable(wh, "ns", "people")
    t.overwrite(Seq((1L, "alice", 30L), (2L, "bob", 40L), (3L, "carol", 40L))
      .toDF("id", "name", "age"))
    t
  }

  test("CREATE VIEW + SELECT: body re-expands, bare names bind to the view's namespace") {
    val wh = freshCatalog("basic")
    val t = people(wh)
    // bare `people` in the body must resolve to graft.ns.people (the
    // view's own namespace), not the session catalog
    spark.sql("CREATE VIEW graft.ns.grownups AS SELECT name FROM people WHERE age >= 40")
    assert(spark.sql("SELECT * FROM graft.ns.grownups ORDER BY name")
      .as[String].collect().toSeq == Seq("bob", "carol"))
    // TEXT semantics: new table rows appear through the view unchanged
    t.append(Seq((4L, "dave", 50L)).toDF("id", "name", "age"))
    assert(spark.sql("SELECT count(*) FROM graft.ns.grownups").as[Long].head() == 3L)
    // qualified column references through the alias work
    assert(spark.sql(
      "SELECT g.name FROM graft.ns.grownups g WHERE g.name = 'dave'").count() == 1)
  }

  test("time-travel SQL works INSIDE a view body (the reference's named time-travel queries)") {
    val wh = freshCatalog("tt")
    val t = SnapshotTable(wh, "ns", "ev")
    val saved = SnapshotTable.clockMs
    try {
      SnapshotTable.clockMs = () => 1000L
      t.overwrite(Seq((1L, "a")).toDF("id", "v"))
      SnapshotTable.clockMs = () => 2000L
      t.append(Seq((2L, "b")).toDF("id", "v"))
    } finally SnapshotTable.clockMs = saved
    spark.sql("CREATE VIEW graft.ns.ev_v1 AS SELECT id, v FROM graft.ns.ev VERSION AS OF 1")
    assert(spark.sql("SELECT * FROM graft.ns.ev_v1").count() == 1)
    assert(spark.sql("SELECT count(*) FROM graft.ns.ev").as[Long].head() == 2L)
    // time travel ON the view itself is refused with a pointer inward
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.ns.ev_v1 VERSION AS OF 1").collect())
    assert(e.getMessage.contains("inside the view body"))
    // ... and time travel over a view INSIDE another view's body too
    val e2 = intercept[Exception](spark.sql(
      "CREATE VIEW graft.ns.bad_tt AS SELECT * FROM graft.ns.ev_v1 TIMESTAMP AS OF '1970-01-01'"))
    assert(e2.getMessage.contains("inside the view body"), e2.getMessage)
  }

  test("SHOW VIEWS lists with pattern filtering; DROP VIEW removes") {
    val wh = freshCatalog("show")
    people(wh)
    spark.sql("CREATE VIEW graft.ns.v_ages AS SELECT age FROM people")
    spark.sql("CREATE VIEW graft.ns.v_names AS SELECT name FROM people")
    spark.sql("CREATE VIEW graft.ns.other AS SELECT id FROM people")
    val all = spark.sql("SHOW VIEWS IN graft.ns").collect()
    assert(all.map(_.getString(1)).toSeq == Seq("other", "v_ages", "v_names"))
    assert(all.forall(r => r.getString(0) == "ns" && !r.getBoolean(2)))
    assert(spark.sql("SHOW VIEWS IN graft.ns LIKE 'v_*'").collect()
      .map(_.getString(1)).toSeq == Seq("v_ages", "v_names"))
    assert(spark.sql("SHOW VIEWS IN graft.ns LIKE 'other|v_ages'").collect()
      .map(_.getString(1)).toSeq == Seq("other", "v_ages"))
    spark.sql("DROP VIEW graft.ns.v_ages")
    assert(spark.sql("SHOW VIEWS IN graft.ns").count() == 2)
    intercept[Exception](spark.sql("DROP VIEW graft.ns.v_ages"))
    spark.sql("DROP VIEW IF EXISTS graft.ns.v_ages") // no-op, no error
  }

  test("CREATE OR REPLACE and IF NOT EXISTS semantics") {
    val wh = freshCatalog("replace")
    people(wh)
    spark.sql("CREATE VIEW graft.ns.v AS SELECT id FROM people")
    intercept[Exception](spark.sql("CREATE VIEW graft.ns.v AS SELECT name FROM people"))
    spark.sql("CREATE VIEW IF NOT EXISTS graft.ns.v AS SELECT name FROM people")
    assert(spark.sql("SELECT * FROM graft.ns.v").columns.toSeq == Seq("id"))
    spark.sql("CREATE OR REPLACE VIEW graft.ns.v AS SELECT name FROM people")
    assert(spark.sql("SELECT * FROM graft.ns.v").columns.toSeq == Seq("name"))
  }

  test("user column aliases rename the view's output") {
    val wh = freshCatalog("aliases")
    people(wh)
    spark.sql(
      "CREATE VIEW graft.ns.heads (person, years) AS SELECT name, age FROM people")
    val df = spark.sql("SELECT person, years FROM graft.ns.heads WHERE years >= 40")
    assert(df.columns.toSeq == Seq("person", "years"))
    assert(df.count() == 2)
    // alias count must match the query arity — rejected at CREATE
    intercept[Exception](spark.sql(
      "CREATE VIEW graft.ns.bad (a, b, c) AS SELECT name, age FROM people"))
  }

  test("nested views expand recursively; a cycle fails with a clear error") {
    val wh = freshCatalog("nest")
    people(wh)
    spark.sql("CREATE VIEW graft.ns.base AS SELECT id, age FROM people")
    spark.sql("CREATE VIEW graft.ns.agg AS SELECT age, count(*) AS n FROM base GROUP BY age")
    assert(spark.sql("SELECT * FROM graft.ns.agg ORDER BY age")
      .as[(Long, Long)].collect().toSeq == Seq((30L, 1L), (40L, 2L)))
    // OR REPLACE that would close a cycle (base -> agg -> base) is
    // rejected at CREATE-validation time, not at first read
    val e = intercept[Exception](spark.sql(
      "CREATE OR REPLACE VIEW graft.ns.base AS SELECT age, n FROM agg"))
    assert(e.getMessage.contains("recursive view"), e.getMessage)
  }

  test("a view that does not resolve is rejected at CREATE; views are not writable") {
    val wh = freshCatalog("guards")
    people(wh)
    intercept[Exception](spark.sql(
      "CREATE VIEW graft.ns.broken AS SELECT nope FROM people"))
    intercept[Exception](spark.sql(
      "CREATE VIEW graft.ns.broken AS SELECT * FROM no_such_table"))
    assert(spark.sql("SHOW VIEWS IN graft.ns").count() == 0)
    spark.sql("CREATE VIEW graft.ns.v AS SELECT id, name, age FROM people")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO graft.ns.v VALUES (9, 'zed', 9)"))
    assert(e.getMessage.contains("VIEW"), e.getMessage)
  }

  test("views survive a catalog reload (fresh catalog instance, same warehouse)") {
    val wh = freshCatalog("reload")
    people(wh)
    spark.sql("CREATE VIEW graft.ns.keeper AS SELECT name FROM people WHERE id = 1")
    val cat2 = new GraftCatalog
    cat2.initialize("graft2",
      new CaseInsensitiveStringMap(Map("warehouse" -> wh).asJava))
    spark.conf.set("spark.sql.catalog.graft2.warehouse", wh)
    val v = cat2.loadView(Identifier.of(Array("ns"), "keeper"))
    assert(v.query().contains("SELECT name FROM people"))
    assert(v.schema().fieldNames.toSeq == Seq("name"))
    assert(cat2.listViews("ns").map(_.name).toSeq == Seq("keeper"))
    // and the SQL read path still serves it (file-backed, no session state)
    assert(spark.sql("SELECT * FROM graft.ns.keeper").as[String].head() == "alice")
  }

  test("ViewCatalog API: create/list/alter/rename/drop programmatically") {
    val wh = freshCatalog("api")
    people(wh)
    val cat = new GraftCatalog
    cat.initialize("graft", new CaseInsensitiveStringMap(Map("warehouse" -> wh).asJava))
    val ident = Identifier.of(Array("ns"), "api_v")
    cat.createView(new ViewInfo(ident, "SELECT id FROM people", "graft",
      Array("ns"), new StructType(), Array.empty, Array.empty, Array.empty,
      Map("owner" -> "me").asJava))
    assert(cat.viewExists(ident))
    assert(cat.loadView(ident).properties().get("owner") == "me")
    // the schema is derived by validation, not trusted from the caller
    assert(cat.loadView(ident).schema().fieldNames.toSeq == Seq("id"))
    val altered = cat.alterView(ident, ViewChange.setProperty("tier", "gold"),
      ViewChange.removeProperty("owner"))
    assert(altered.properties().asScala == Map("tier" -> "gold"))
    val renamed = Identifier.of(Array("ns"), "api_v2")
    cat.renameView(ident, renamed)
    assert(!cat.viewExists(ident) && cat.viewExists(renamed))
    assert(cat.dropView(renamed) && !cat.dropView(renamed))
  }

  test("hostile view names stay inside _views and never collide across namespaces") {
    val wh = freshCatalog("hostile")
    people(wh)
    val cat = new GraftCatalog
    cat.initialize("graft", new CaseInsensitiveStringMap(Map("warehouse" -> wh).asJava))
    def mk(ns: String, name: String): Unit =
      cat.createView(new ViewInfo(Identifier.of(Array(ns), name),
        "SELECT id FROM ns.people", "graft", Array("ns"), new StructType(),
        Array.empty, Array.empty, Array.empty, Map.empty[String, String].asJava))
    // path-traversal characters in the name must not escape _views
    mk("ns", "../escape")
    mk("ns", "a/b")
    val viewsDir = new java.io.File(wh, "_views")
    val inside = Option(viewsDir.listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(inside.count(_.endsWith(".json")) == 2, inside.toSeq)
    assert(!new java.io.File(wh, "escape.json").exists())
    // dotted names are unambiguous across namespaces: (ns, x.y) and
    // (ns.x, y) are DIFFERENT views with different sidecars
    mk("ns", "x.y")
    mk("ns.x", "y")
    assert(cat.viewExists(Identifier.of(Array("ns"), "x.y")))
    assert(cat.viewExists(Identifier.of(Array("ns.x"), "y")))
    // listing ns does not leak ns.x's views; round-trips decoded names
    val listed = cat.listViews("ns").map(_.name()).toSeq
    assert(listed.contains("x.y") && listed.contains("../escape") &&
      listed.contains("a/b") && !listed.contains("y"), listed)
    assert(cat.listViews("ns.x").map(_.name()).toSeq == Seq("y"))
    assert(cat.dropView(Identifier.of(Array("ns"), "x.y")))
    assert(cat.viewExists(Identifier.of(Array("ns.x"), "y")))
    // a LEGACY sidecar written before the percent-encoder (raw '%' not
    // followed by two hex digits) must not crash the namespace listing;
    // its name passes through verbatim
    val legacy = new java.io.File(viewsDir, "ns.50%off.json")
    java.nio.file.Files.write(legacy.toPath,
      """{"namespace":"ns","name":"50%off","sql":"SELECT 1 AS x","currentCatalog":"spark_catalog","currentNamespace":[],"schemaJson":"","queryColumnNames":[],"columnAliases":[],"properties":{}}"""
        .getBytes("UTF-8")): Unit
    assert(cat.listViews("ns").map(_.name()).contains("50%off"),
      "legacy un-encoded sidecars must list, not crash the namespace")
  }

  test("table/view name collisions are refused in both directions") {
    val wh = freshCatalog("collide")
    people(wh)
    intercept[Exception](spark.sql(
      "CREATE VIEW graft.ns.people AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW graft.ns.occupied AS SELECT id FROM people")
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE graft.ns.occupied (x BIGINT)"))
    assert(e.getMessage.contains("VIEW"), e.getMessage)
  }

  test("ALTER VIEW AS / SET-UNSET TBLPROPERTIES / RENAME TO / SHOW CREATE TABLE") {
    val wh = freshCatalog("alter")
    people(wh)
    spark.sql("CREATE VIEW graft.ns.v AS SELECT id FROM people")
    // swap the body: re-validated, properties survive, output renames
    spark.sql("ALTER VIEW graft.ns.v SET TBLPROPERTIES ('tier' = 'gold', 'tmp' = 'x')")
    spark.sql("ALTER VIEW graft.ns.v AS SELECT name, age FROM people WHERE age > 30")
    assert(spark.sql("SELECT * FROM graft.ns.v").columns.toSeq == Seq("name", "age"))
    assert(spark.sql("SELECT count(*) FROM graft.ns.v").head.getLong(0) == 2L)
    intercept[Exception](spark.sql("ALTER VIEW graft.ns.v AS SELECT nope FROM people"))
    spark.sql("ALTER VIEW graft.ns.v UNSET TBLPROPERTIES ('tmp')")
    intercept[Exception](
      spark.sql("ALTER VIEW graft.ns.v UNSET TBLPROPERTIES ('never_set')"))
    spark.sql("ALTER VIEW graft.ns.v UNSET TBLPROPERTIES IF EXISTS ('never_set')")
    val ddl = spark.sql("SHOW CREATE TABLE graft.ns.v").head.getString(0)
    assert(ddl.contains("CREATE VIEW graft.ns.v") &&
      ddl.contains("'tier' = 'gold'") && !ddl.contains("tmp") &&
      ddl.contains("SELECT name, age FROM people WHERE age > 30"), ddl)
    spark.sql("ALTER VIEW graft.ns.v RENAME TO ns.v2")
    assert(spark.sql("SHOW VIEWS IN graft.ns").collect()
      .map(_.getString(1)).toSeq == Seq("v2"))
    assert(spark.sql("SELECT * FROM graft.ns.v2").count() == 2)
  }

  test("materialized views: precomputed serving, watermark staleness, guarded lifecycle") {
    val wh = freshCatalog("mv")
    val t = people(wh)
    spark.sql("""CALL graft.system.create_materialized_view(
                |  `table` => 'ns.age_counts',
                |  query => 'SELECT age, count(*) AS n FROM graft.ns.people GROUP BY age')"""
      .stripMargin)
    // serving read = the precomputed storage table
    assert(spark.sql("SELECT * FROM graft.ns.age_counts ORDER BY age")
      .as[(Long, Long)].collect().toSeq == Seq((30L, 1L), (40L, 2L)))
    // the storage plan is a SCAN of the MV table, not a recompute of people
    val plan = spark.sql("SELECT * FROM graft.ns.age_counts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate"), s"MV read must not re-aggregate:\n$plan")
    // SHOW VIEWS lists it; DROP VIEW and INSERT refuse with pointers
    assert(spark.sql("SHOW VIEWS IN graft.ns").collect().map(_.getString(1))
      .contains("age_counts"))
    assert(intercept[Exception](spark.sql("DROP VIEW graft.ns.age_counts"))
      .getMessage.contains("drop_materialized_view"))
    assert(intercept[Exception](spark.sql(
      "INSERT INTO graft.ns.age_counts VALUES (1, 1)"))
      .getMessage.contains("MATERIALIZED"))
    // stale after a source commit; refresh recomputes exactly once
    t.append(Seq((9L, "zed", 40L)).toDF("id", "name", "age"))
    val status = spark.sql(
      "CALL graft.system.materialized_view_status(`table` => 'ns.age_counts')").collect()
    assert(status.length == 1 && !status.head.getBoolean(3))
    assert(spark.sql(
      "CALL graft.system.refresh_materialized_view(`table` => 'ns.age_counts')")
      .head.getBoolean(0))
    assert(spark.sql("SELECT n FROM graft.ns.age_counts WHERE age = 40")
      .as[Long].head() == 3L)
    assert(!spark.sql(
      "CALL graft.system.refresh_materialized_view(`table` => 'ns.age_counts')")
      .head.getBoolean(0))
    // the MV's own history time-travels (it is a snapshot table)
    assert(spark.sql("SELECT n FROM graft.ns.age_counts VERSION AS OF 1 WHERE age = 40")
      .as[Long].head() == 2L)
    // every definition-mutating DDL refuses on an MV (the sidecar
    // carries engine state; the name binds the storage table)
    assert(intercept[Exception](spark.sql(
      "ALTER VIEW graft.ns.age_counts AS SELECT age FROM graft.ns.people"))
      .getMessage.contains("MATERIALIZED"))
    assert(intercept[Exception](spark.sql(
      "ALTER VIEW graft.ns.age_counts SET TBLPROPERTIES ('x' = 'y')"))
      .getMessage.contains("MATERIALIZED"))
    assert(intercept[Exception](spark.sql(
      "ALTER VIEW graft.ns.age_counts RENAME TO ns.other_name"))
      .getMessage.contains("MATERIALIZED"))
    // lifecycle end: drop removes sidecar + storage
    assert(spark.sql(
      "CALL graft.system.drop_materialized_view(`table` => 'ns.age_counts')")
      .head.getBoolean(0))
    assert(spark.sql("SHOW VIEWS IN graft.ns").count() == 0)
    intercept[Exception](spark.sql("SELECT * FROM graft.ns.age_counts").collect())
  }

  test("renaming a view onto an existing table name is refused") {
    val wh = freshCatalog("rename_guard")
    people(wh)
    spark.sql("CREATE VIEW graft.ns.v AS SELECT id FROM people")
    val e = intercept[Exception](
      spark.sql("ALTER VIEW graft.ns.v RENAME TO ns.people"))
    assert(e.getMessage.contains("TABLE"), e.getMessage)
    // the view still answers under its old name
    assert(spark.sql("SELECT * FROM graft.ns.v").count() == 3)
  }

  test("temp views and session-catalog names are untouched by the interception") {
    val wh = freshCatalog("temp")
    people(wh)
    Seq((99L, "temp")).toDF("id", "src").createOrReplaceTempView("scratch")
    assert(spark.sql("SELECT src FROM scratch").as[String].head() == "temp")
    spark.sql("DROP VIEW scratch") // session temp-view path, not graft's
    intercept[Exception](spark.sql("SELECT * FROM scratch").collect())
  }
}
