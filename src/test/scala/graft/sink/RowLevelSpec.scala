package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Row-level UPDATE / MERGE (dir-granular copy-on-write): affected-dir
  * detection, carry-forward of untouched dirs, interplay with masks /
  * equality deletes, merge action shapes, and the SQL cardinality rule.
  */
class RowLevelSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): SnapshotTable =
    SnapshotTable(Files.createTempDirectory("graft_rl").toString, "ns", "t")

  test("updateWhere rewrites only the dirs holding matching rows") {
    val t = freshTable()
    t.overwrite((1L to 100L).toDF("id").withColumn("v", lit("a")))
    t.append((101L to 200L).toDF("id").withColumn("v", lit("a")))
    val untouched = t.currentSnapshot.get.dataDirs.last
    val snap = t.updateWhere(spark, col("id") <= 50L, Map("v" -> lit("b")))
    assert(snap.operation == "update")
    assert(snap.dataDirs.contains(untouched)) // second dir carried forward
    assert(!snap.dataDirs.contains(t.snapshots.head.dataDirs.head))
    assert(snap.rowCount == 200L)
    val out = t.read(spark)
    assert(out.filter(col("v") === "b").count() == 50L)
    assert(out.filter(col("v") === "a").count() == 150L)
  }

  test("updateWhere matching nothing commits nothing") {
    val t = freshTable()
    t.overwrite((1L to 10L).toDF("id").withColumn("v", lit(1)))
    val before = t.currentSnapshot.get.id
    val snap = t.updateWhere(spark, col("id") > 999L, Map("v" -> lit(2)))
    assert(snap.id == before)
    assert(t.snapshots.size == 1)
  }

  test("updateWhere casts assignments to the column type and can self-reference") {
    val t = freshTable()
    t.overwrite(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    t.updateWhere(spark, col("id") === 2L, Map("v" -> (col("v") + 5)))
    assert(t.read(spark).orderBy("id").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 10L), (2L, 25L)))
    // unknown column rejected
    val e = intercept[IllegalArgumentException](
      t.updateWhere(spark, lit(true), Map("nope" -> lit(1))))
    assert(e.getMessage.contains("unknown column"))
  }

  test("updateWhere bakes equality deletes of rewritten dirs into the data") {
    val t = freshTable()
    t.overwrite((1L to 100L).toDF("id").withColumn("v", lit("x")))
    t.deleteWhere(Seq(7L).toDF("id"), Seq("id"))
    assert(t.currentSnapshot.get.deletes.nonEmpty)
    t.updateWhere(spark, col("id") <= 100L, Map("v" -> lit("y")))
    val snap = t.currentSnapshot.get
    // the rewritten dir replaced the delete's entire scope -> delete gone
    assert(snap.deletes.isEmpty)
    assert(t.read(spark).count() == 99L)
    assert(t.read(spark).filter(col("id") === 7L).count() == 0L)
    assert(snap.rowCount == 99L)
  }

  test("mergeInto upserts: matched update + unmatched insert") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "bal"))
    val src = Seq((2L, "b2", 20.0), (3L, "c", 3.0)).toDF("id", "name", "bal")
    val snap = t.mergeInto(src, Seq("id" -> "id"), Merge.UpdateAll, Merge.InsertAll)
    assert(snap.operation == "merge")
    assert(snap.rowCount == 3L)
    assert(t.read(spark).orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0)))
  }

  test("mergeInto with explicit sets referencing both sides") {
    val t = freshTable()
    t.overwrite(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "bal"))
    val src = Seq((2L, 5.0)).toDF("id", "delta")
    t.mergeInto(src, Seq("id" -> "id"),
      Merge.Update(Map("bal" -> (Merge.t("bal") + Merge.s("delta")))),
      Merge.Ignore)
    assert(t.read(spark).orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 25.0)))
  }

  test("mergeInto delete action removes matched rows; count restated") {
    val t = freshTable()
    t.overwrite((1L to 10L).toDF("id"))
    val snap = t.mergeInto(Seq(3L, 4L).toDF("id"), Seq("id" -> "id"),
      Merge.Delete, Merge.Ignore)
    assert(snap.rowCount == 8L)
    assert(t.read(spark).as[Long].collect().sorted.toSeq ==
      (1L to 10L).filterNot(Set(3L, 4L)))
  }

  test("mergeInto insert-only (KeepMatched) rewrites no dir") {
    val t = freshTable()
    t.overwrite((1L to 5L).toDF("id"))
    val dirsBefore = t.currentSnapshot.get.dataDirs
    val snap = t.mergeInto(Seq(3L, 99L).toDF("id"), Seq("id" -> "id"),
      Merge.KeepMatched, Merge.InsertAll)
    assert(dirsBefore.forall(snap.dataDirs.contains)) // nothing rewritten
    assert(snap.rowCount == 6L)
    assert(t.read(spark).as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 99L))
  }

  test("mergeInto rejects duplicate source keys (SQL cardinality rule)") {
    val t = freshTable()
    t.overwrite(Seq(1L).toDF("id"))
    val e = intercept[IllegalArgumentException](
      t.mergeInto(Seq(1L, 1L).toDF("id"), Seq("id" -> "id"),
        Merge.Delete, Merge.Ignore))
    assert(e.getMessage.contains("cardinality"))
  }

  test("duplicate source keys among NOT-matched rows are legal: they all insert") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    // key 9 is duplicated but matches no target row — SQL says both
    // rows insert; only a duplicate that MATCHES violates cardinality
    val src = Seq((1L, "a2"), (9L, "x"), (9L, "y")).toDF("id", "v")
    val snap = t.mergeInto(src, Seq("id" -> "id"), Merge.UpdateAll, Merge.InsertAll)
    assert(snap.rowCount == 3L)
    assert(t.read(spark).orderBy("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a2"), (9L, "x"), (9L, "y")))
  }

  test("no-op merge (nothing matched to rewrite, nothing to insert) commits nothing") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val before = t.currentSnapshot.get
    val snapsBefore = t.snapshots.size
    // KeepMatched + InsertAll where every source row matches: no dir to
    // rewrite, zero inserts — must NOT write an empty dir + snapshot
    val snap = t.mergeInto(Seq((1L, "a9")).toDF("id", "v"),
      Seq("id" -> "id"), Merge.KeepMatched, Merge.InsertAll)
    assert(snap.id == before.id)
    assert(t.snapshots.size == snapsBefore)
    assert(t.currentSnapshot.get.dataDirs == before.dataDirs)
  }

  test("conditional clauses apply first-true-wins (delete, then update fallback)") {
    val t = freshTable()
    t.overwrite(Seq((1L, 10.0), (2L, -5.0), (3L, 30.0), (4L, 40.0)).toDF("id", "bal"))
    val src = Seq((1L, 100.0), (2L, 200.0), (3L, -1.0)).toDF("id", "newBal")
    val snap = t.mergeClauses(src, Seq("id" -> "id"),
      Seq(
        // clause 1: delete matched rows whose SOURCE value is negative
        Merge.WhenMatched(Merge.Delete, Some(Merge.s("newBal") < 0)),
        // clause 2 (fallback): adopt the source value
        Merge.WhenMatched(Merge.Update(Map("bal" -> Merge.s("newBal"))))),
      Nil)
    assert(snap.operation == "merge")
    // id=3 deleted (clause 1), ids 1,2 updated (clause 2), id=4 untouched
    assert(t.read(spark).orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 100.0), (2L, 200.0), (4L, 40.0)))
    assert(snap.rowCount == 3L)
  }

  test("conditional NOT MATCHED inserts: first-true-wins across insert clauses") {
    val t = freshTable()
    t.overwrite(Seq((1L, "old", 0.0)).toDF("id", "tag", "bal"))
    val src = Seq((2L, 1500.0), (3L, 10.0), (4L, 2000.0)).toDF("id", "amount")
    t.mergeClauses(src, Seq("id" -> "id"),
      Nil,
      Seq(
        Merge.WhenNotMatched(
          Merge.Insert(Map("id" -> Merge.s("id"), "tag" -> lit("vip"),
            "bal" -> Merge.s("amount"))),
          Some(Merge.s("amount") >= 1000.0)),
        Merge.WhenNotMatched(
          Merge.Insert(Map("id" -> Merge.s("id"), "tag" -> lit("std"),
            "bal" -> Merge.s("amount"))))))
    assert(t.read(spark).orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "old", 0.0), (2L, "vip", 1500.0), (3L, "std", 10.0), (4L, "vip", 2000.0)))
  }

  test("NOT MATCHED BY SOURCE clauses act on unmatched target rows, ordered") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a", 10.0), (2L, "b", -5.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("id", "name", "bal"))
    // delivery covers ids 1 and 5 only; absent rows (2,3,4): negative
    // balances retire, the rest are flagged stale — while the delivered
    // rows upsert in the same statement
    val src = Seq((1L, 100.0), (5L, 50.0)).toDF("id", "amount")
    val snap = t.mergeClauses(src, Seq("id" -> "id"),
      Seq(Merge.WhenMatched(Merge.Update(Map("bal" -> Merge.s("amount"))))),
      Seq(Merge.WhenNotMatched(Merge.Insert(Map(
        "id" -> Merge.s("id"), "name" -> lit("new"), "bal" -> Merge.s("amount"))))),
      Seq(
        Merge.WhenNotMatchedBySource(Merge.Delete, Some(Merge.t("bal") < 0)),
        Merge.WhenNotMatchedBySource(Merge.Update(Map(
          "name" -> concat(lit("stale_"), Merge.t("name")))))))
    assert(snap.operation == "merge")
    assert(t.read(spark).orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 100.0), (3L, "stale_c", 30.0), (4L, "stale_d", 40.0),
        (5L, "new", 50.0)))
    assert(snap.rowCount == 4L)
  }

  test("BY SOURCE detection is condition-restricted: untouched dirs carry forward") {
    val t = freshTable()
    // dir 1: ids 1-100 (all matched by the delivery); dir 2: ids 101-200
    // (absent, but every row fails the BY SOURCE condition)
    t.overwrite((1L to 100L).toDF("id").withColumn("v", lit("a")))
    t.append((101L to 200L).toDF("id").withColumn("v", lit("a")))
    val dirs = t.currentSnapshot.get.dataDirs
    val src = (1L to 100L).toDF("id")
    val snap = t.mergeClauses(src, Seq("id" -> "id"),
      Nil, Nil,
      Seq(Merge.WhenNotMatchedBySource(Merge.Delete, Some(Merge.t("id") > 500L))))
    // nothing matched the condition: both dirs survive byte-identical
    // (no matched clause -> dir 1 not even a rewrite candidate; dir 2's
    // unmatched rows all fail the condition -> anti-join detection
    // filtered it out)
    assert(snap.id == t.snapshots.map(_.id).max)
    assert(snap.dataDirs == dirs, "both dirs must carry forward untouched")
    assert(t.read(spark).count() == 200L)
  }

  test("SQL MERGE WHEN NOT MATCHED BY SOURCE lowers through the catalog") {
    val wh = Files.createTempDirectory("graft_rl_nbs").toString
    val t = SnapshotTable(wh, "ns", "nbs")
    t.overwrite(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "bal"))
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    Seq((1L, 11.0)).toDF("id", "bal").createOrReplaceTempView("nbs_src")
    spark.sql("""MERGE INTO graft.ns.nbs t USING nbs_src s ON t.id = s.id
                |WHEN MATCHED THEN UPDATE SET bal = s.bal
                |WHEN NOT MATCHED BY SOURCE AND t.bal >= 30.0 THEN DELETE
                |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET bal = t.bal * -1.0""".stripMargin)
    assert(t.read(spark).orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 11.0), (2L, -20.0)))
  }

  test("mergeInto key columns can differ in name between sides") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val src = Seq((2L, "B")).toDF("key", "v")
    t.mergeInto(src, Seq("id" -> "key"), Merge.UpdateAll, Merge.Ignore)
    assert(t.read(spark).orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B")))
  }

  test("SQL UPDATE and MERGE lower through the catalog onto the same path") {
    val wh = Files.createTempDirectory("graft_rl_sql").toString
    val t = SnapshotTable(wh, "ns", "sqlt")
    t.overwrite(Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "name", "bal"))
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.sql("UPDATE graft.ns.sqlt SET bal = bal * 10 WHERE id >= 2")
    assert(spark.sql("SELECT bal FROM graft.ns.sqlt WHERE id = 2").as[Double].head() == 20.0)
    assert(t.currentSnapshot.get.operation == "update")

    Seq((3L, "c9", 999.0), (4L, "d", 4.0)).toDF("id", "name", "bal")
      .createOrReplaceTempView("rl_src")
    spark.sql("""MERGE INTO graft.ns.sqlt t USING rl_src s ON t.id = s.id
                |WHEN MATCHED THEN UPDATE SET bal = s.bal
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(t.currentSnapshot.get.operation == "merge")
    assert(spark.sql("SELECT id, name, bal FROM graft.ns.sqlt ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.0), (2L, "b", 20.0), (3L, "c", 999.0), (4L, "d", 4.0)))
    // matched UPDATE SET only touches the assigned column: name kept "c"
    assert(spark.sql("SELECT name FROM graft.ns.sqlt WHERE id = 3").as[String].head() == "c")

    // unsupported shapes fail loudly, not wrongly
    val e = intercept[Exception](spark.sql(
      """MERGE INTO graft.ns.sqlt t USING rl_src s ON t.id > s.id
        |WHEN MATCHED THEN DELETE""".stripMargin))
    assert(e.getMessage.contains("equality conjunction"))
  }

  test("SQL MERGE with conditional + multiple clauses (first-true-wins)") {
    val wh = Files.createTempDirectory("graft_rl_csql").toString
    val t = SnapshotTable(wh, "ns", "csqlt")
    t.overwrite(Seq((1L, "a", 10.0), (2L, "b", -99.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal"))
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    Seq((1L, "a2", -1.0), (2L, "b2", 5.0), (4L, "d", 2000.0), (5L, "e", 1.0))
      .toDF("id", "name", "bal").createOrReplaceTempView("rl_cond_src")
    spark.sql(
      """MERGE INTO graft.ns.csqlt t USING rl_cond_src s ON t.id = s.id
        |WHEN MATCHED AND s.bal < 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET bal = s.bal, name = s.name
        |WHEN NOT MATCHED AND s.bal >= 1000.0 THEN INSERT *""".stripMargin)
    // id=1 deleted (source bal<0); id=2 updated; id=3 untouched;
    // id=4 inserted (bal>=1000); id=5 dropped (insert cond false)
    assert(spark.sql("SELECT id, name, bal FROM graft.ns.csqlt ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((2L, "b2", 5.0), (3L, "c", 30.0), (4L, "d", 2000.0)))
    assert(t.currentSnapshot.get.rowCount == 3L)
  }

  test("SQL DML with subqueries in conditions is rejected explicitly") {
    val wh = Files.createTempDirectory("graft_rl_sub").toString
    val t = SnapshotTable(wh, "ns", "subt")
    t.overwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "bal"))
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    Seq(1L).toDF("id").createOrReplaceTempView("rl_sub_keys")
    val e = intercept[Exception](spark.sql(
      "UPDATE graft.ns.subt SET bal = 0 WHERE id IN (SELECT id FROM rl_sub_keys)"))
    assert(e.getMessage.contains("subquer"))
    // table unchanged
    assert(t.read(spark).filter(col("bal") === 0.0).count() == 0L)
  }

  test("uncorrelated SCALAR subqueries in DML materialize once per statement") {
    val wh = Files.createTempDirectory("graft_rl_scalar").toString
    val t = SnapshotTable(wh, "ns", "sct")
    t.overwrite(Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "bal"))
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    Seq(5.0, 15.0).toDF("bonus").createOrReplaceTempView("rl_sc_bonus")
    // UPDATE: scalar subqueries in both the assignment and the WHERE;
    // SQL contract = evaluated once, against the PRE-update state
    spark.sql("""UPDATE graft.ns.sct
                |SET bal = bal + (SELECT max(bonus) FROM rl_sc_bonus)
                |WHERE bal >= (SELECT avg(bal) FROM graft.ns.sct)""".stripMargin)
    assert(t.read(spark).orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 35.0), (3L, 45.0)))
    // MERGE: scalar subquery inside a clause condition
    Seq((1L, 100.0), (2L, 1.0)).toDF("id", "amount").createOrReplaceTempView("rl_sc_src")
    spark.sql("""MERGE INTO graft.ns.sct t USING rl_sc_src s ON t.id = s.id
                |WHEN MATCHED AND s.amount > (SELECT min(bonus) FROM rl_sc_bonus)
                |  THEN UPDATE SET bal = s.amount""".stripMargin)
    assert(t.read(spark).orderBy("id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 100.0), (2L, 35.0), (3L, 45.0)))
    // a zero-row scalar subquery is NULL (condition never true): no-op
    spark.sql("""UPDATE graft.ns.sct SET bal = 0
                |WHERE bal > (SELECT bonus FROM rl_sc_bonus WHERE bonus > 999)""".stripMargin)
    assert(t.read(spark).filter(col("bal") === 0.0).count() == 0L)
    // correlated subqueries stay rejected with the actionable message
    val e = intercept[Exception](spark.sql(
      """UPDATE graft.ns.sct SET bal = 0
        |WHERE bal > (SELECT max(bonus) FROM rl_sc_bonus WHERE bonus < bal)""".stripMargin))
    assert(e.getMessage.contains("SCALAR subqueries") ||
      e.getMessage.toLowerCase.contains("correlated"), e.getMessage)
  }

  test("SQL MERGE delete + partitioned copy-on-write keeps the layout") {
    val t = freshTable()
    val df = Seq((1L, "x", "d1"), (2L, "y", "d1"), (3L, "z", "d2"))
      .toDF("id", "v", "day")
    t.overwrite(df, partitionCols = Seq("day"))
    t.mergeInto(Seq(2L).toDF("id"), Seq("id" -> "id"), Merge.Delete, Merge.Ignore)
    assert(t.partitionColumns == Seq("day"))
    assert(t.read(spark).select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // partition pruning still fires on the rewritten layout
    val pruned = t.read(spark).filter(col("day") === "d2")
    assert(pruned.count() == 1L)
  }
}
