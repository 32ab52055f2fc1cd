package graft.catalog

import graft.sink.{Merge, SnapshotTable}
import org.apache.spark.sql.{Column, GraftSqlShim, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

/** Analyzer rule (installed by [[graft.GraftExtensions]]) that lowers
  * SQL row-level DML on graft-catalog tables — `UPDATE` and
  * `MERGE INTO` — onto the engine's copy-on-write primitives
  * ([[SnapshotTable.updateWhere]] / [[SnapshotTable.mergeInto]]).
  * DELETE needs no lowering: it goes through the DSv2 `SupportsDelete`
  * push-down onto merge-on-read equality deletes.
  *
  * Spark's own row-level machinery requires `SupportsRowLevelOperations`
  * (a full group-based rewrite protocol); this rule intercepts the
  * RESOLVED-but-unrewritten commands first — the same pattern Delta's
  * DeltaAnalysis uses for its V1 execution core. Supported surface, by
  * construction of the engine path:
  *  - `UPDATE t SET c = expr, ... [WHERE cond]` — arbitrary expressions
  *    over the target row;
  *  - `MERGE INTO t USING s ON` equality conjunctions of target and
  *    source columns, one unconditional `WHEN MATCHED THEN
  *    UPDATE SET ... | UPDATE SET * | DELETE`, one unconditional
  *    `WHEN NOT MATCHED THEN INSERT ... | INSERT *`.
  * Everything else (conditional clauses, NOT MATCHED BY SOURCE, non-
  * equality ON) raises a clear unsupported error instead of a rewrite
  * that silently diverges from SQL semantics.
  */
final class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftRel(target).isDefined =>
      val t = graftTable(target, "UPDATE")
      val tSet = target.outputSet
      GraftUpdateCommand(
        t.snapTable,
        condition.map(xlate(_, tSet, AttributeSet.empty)),
        assignments.map(a =>
          topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, AttributeSet.empty)).toMap)

    case m: MergeIntoTable if m.resolved && graftRel(m.targetTable).isDefined =>
      lowerMerge(m)
  }

  private def graftRel(plan: LogicalPlan): Option[DataSourceV2Relation] =
    plan.collectFirst {
      case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSparkTable] => r
    }

  private def graftTable(plan: LogicalPlan, verb: String): GraftSparkTable = {
    val t = graftRel(plan).get.table.asInstanceOf[GraftSparkTable]
    require(t.metaKind.isEmpty, s"$verb on metadata table ${t.name()} is not allowed")
    require(t.pinnedVersion.isEmpty && t.pinnedAsOfMs.isEmpty,
      s"cannot $verb ${t.name()} at a pinned VERSION/TIMESTAMP")
    t
  }

  /** Lift a resolved expression out of the command into a Column over
    * the engine's rewrite frames: target refs become `__t.<name>`
    * (plain `<name>` for single-table UPDATE), source refs `__s.<name>`.
    */
  private def xlate(e: Expression, tSet: AttributeSet, sSet: AttributeSet): Column =
    GraftSqlShim.column(e.transform {
      case a: AttributeReference if sSet.contains(a) =>
        UnresolvedAttribute(Seq("__s", a.name))
      case a: AttributeReference if tSet.contains(a) =>
        if (sSet.isEmpty) UnresolvedAttribute(Seq(a.name))
        else UnresolvedAttribute(Seq("__t", a.name))
    })

  private def topLevelName(key: Expression, verb: String): String = key match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"$verb assigns to a nested field ($other); only top-level columns are supported")
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  private def lowerMerge(m: MergeIntoTable): LogicalPlan = {
    val t = graftTable(m.targetTable, "MERGE")
    require(m.notMatchedBySourceActions.isEmpty,
      "MERGE ... WHEN NOT MATCHED BY SOURCE is not supported; express it as a " +
        "separate UPDATE/DELETE")
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is not supported; evolve the table first " +
        "(ALTER TABLE ADD COLUMN)")
    require(m.matchedActions.size <= 1 && m.notMatchedActions.size <= 1,
      "one WHEN MATCHED and one WHEN NOT MATCHED clause are supported")
    val tSet = m.targetTable.outputSet
    val sSet = m.sourceTable.outputSet

    val keys: Seq[(String, String)] = splitConj(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tSet.contains(a) && sSet.contains(b) => a.name -> b.name
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if sSet.contains(b) && tSet.contains(a) => a.name -> b.name
      case other => throw new UnsupportedOperationException(
        s"MERGE ON must be an equality conjunction of target and source columns; got $other")
    }

    def unconditional(a: MergeAction): Unit = a match {
      case ua: UpdateAction => require(ua.condition.isEmpty,
        "conditional WHEN MATCHED AND ... is not supported")
      case da: DeleteAction => require(da.condition.isEmpty,
        "conditional WHEN MATCHED AND ... is not supported")
      case ia: InsertAction => require(ia.condition.isEmpty,
        "conditional WHEN NOT MATCHED AND ... is not supported")
      case us: UpdateStarAction => require(us.condition.isEmpty,
        "conditional WHEN MATCHED AND ... is not supported")
      case is: InsertStarAction => require(is.condition.isEmpty,
        "conditional WHEN NOT MATCHED AND ... is not supported")
      case _ => ()
    }
    (m.matchedActions ++ m.notMatchedActions).foreach(unconditional)

    val matched: Merge.Matched = m.matchedActions.headOption.map {
      case _: UpdateStarAction => Merge.UpdateAll
      case _: DeleteAction => Merge.Delete
      case ua: UpdateAction =>
        Merge.Update(ua.assignments.map(a =>
          topLevelName(a.key, "MERGE UPDATE") -> xlate(a.value, tSet, sSet)).toMap)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action: $other")
    }.getOrElse(Merge.KeepMatched)

    val notMatched: Merge.NotMatched = m.notMatchedActions.headOption.map {
      case _: InsertStarAction => Merge.InsertAll
      case ia: InsertAction =>
        Merge.Insert(ia.assignments.map(a =>
          topLevelName(a.key, "MERGE INSERT") -> xlate(a.value, tSet, sSet)).toMap)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }.getOrElse(Merge.Ignore)

    GraftMergeCommand(t.snapTable, m.sourceTable, keys, matched, notMatched)
  }
}

/** Executable lowering of `UPDATE graft.ns.t SET ... WHERE ...`. */
final case class GraftUpdateCommand(
    @transient table: SnapshotTable,
    cond: Option[Column],
    sets: Map[String, Column]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.updateWhere(spark, cond.getOrElse(lit(true)), sets)
    Nil
  }
}

/** Executable lowering of `MERGE INTO graft.ns.t USING src ON ...`.
  * The source plan re-analyzes inside `run` (it may itself read graft
  * tables — the inline rule serves it like any other query).
  */
final case class GraftMergeCommand(
    @transient table: SnapshotTable,
    @transient sourcePlan: LogicalPlan,
    keys: Seq[(String, String)],
    matched: Merge.Matched,
    notMatched: Merge.NotMatched) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.mergeInto(GraftSqlShim.ofRows(spark, sourcePlan), keys, matched, notMatched)
    Nil
  }
}
