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
  *    source columns, with any number of ordered `WHEN MATCHED
  *    [AND cond] THEN UPDATE SET ... | UPDATE SET * | DELETE`,
  *    `WHEN NOT MATCHED [AND cond] THEN INSERT ... | INSERT *` and
  *    `WHEN NOT MATCHED BY SOURCE [AND cond] THEN UPDATE SET ... |
  *    DELETE` clauses (each list first-true-wins per row, SQL
  *    clause-order semantics).
  * Everything else (non-equality ON, subqueries in conditions/
  * assignments, schema-evolving MERGE) raises a clear unsupported error
  * instead of a rewrite that silently diverges from SQL semantics.
  */
final class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftRel(target).isDefined =>
      val t = graftTable(target, "UPDATE")
      val tSet = target.outputSet
      condition.flatMap(extractInArm(_, tSet)) match {
        // UPDATE ... WHERE k IN (SELECT ...): lower onto the MERGE
        // engine path — the subquery's distinct keys become the merge
        // source, the IN becomes the key semi-join the COW detection
        // already runs broadcast + key-pruned, and residual conjuncts
        // ride as the matched clause's condition. Never a driver-side
        // key collect: at 100 TB the subquery result stays distributed.
        case Some((keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          GraftMergeCommand(t.snapTable, srcPlan, keys,
            matchedClauses = Seq(Merge.WhenMatched(
              Merge.Update(assignments.map(a =>
                topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, sSet)).toMap),
              rest.map(xlate(_, tSet, sSet)))),
            notMatchedClauses = Nil)
        case None =>
          GraftUpdateCommand(
            t.snapTable,
            condition.map(xlate(_, tSet, AttributeSet.empty)),
            assignments.map(a =>
              topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, AttributeSet.empty)).toMap)
      }

    // DELETE FROM t with a condition the DSv2 SupportsDelete filter API
    // cannot carry: a subquery, or a non-source-translatable predicate
    // (`value * 2 > 500`, function calls, …). Simple attribute/literal
    // predicates stay on the push-down (merge-on-read equality delete).
    // A pure IN-delete keeps the SAME merge-on-read contract (the
    // subquery's distinct keys become the equality-delete file —
    // O(|keys|), no data file rewritten); IN plus residual conjuncts
    // lowers onto the COW merge path as WHEN MATCHED AND <rest> THEN
    // DELETE; everything else onto the file-granular COW delete
    // (deleteRows). A predicate our conservative translatability check
    // misjudges as non-pushable still deletes CORRECTLY — it just pays
    // the COW write instead of the O(keys) delete file.
    case d @ DeleteFromTable(target, condition)
        if d.resolved && graftRel(target).isDefined &&
          (condition.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]) ||
            !pushableDelete(condition)) =>
      val t = graftTable(target, "DELETE")
      val tSet = target.outputSet
      extractInArm(condition, tSet) match {
        case Some((keys, srcPlan, None)) =>
          GraftDeleteInCommand(t.snapTable, srcPlan, keys)
        case Some((keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          GraftMergeCommand(t.snapTable, srcPlan, keys,
            matchedClauses = Seq(Merge.WhenMatched(
              Merge.Delete, rest.map(xlate(_, tSet, sSet)))),
            notMatchedClauses = Nil)
        case None =>
          // scalar/EXISTS-only subquery conditions: evaluate statement-
          // level via the deferred machinery on the UPDATE-free engine
          // delete path (deleteRows below translates through xlate and
          // rejects the unsupported forms with the actionable message)
          GraftDeleteWhereCommand(t.snapTable,
            xlate(condition, tSet, AttributeSet.empty))
      }

    case m: MergeIntoTable if m.resolved && graftRel(m.targetTable).isDefined =>
      lowerMerge(m)
  }

  /** Conservative mirror of Spark's V2 filter translatability: the
    * shapes `DataSourceV2Strategy.translateFilterV2` accepts (attribute
    * vs literal comparisons, literal IN, null tests, string prefix/
    * suffix/contains, boolean combinators). Anything else — arithmetic,
    * function calls, casts — fails the DSv2 push-down at planning with
    * an unhelpful error, so those DELETEs route to the COW path
    * instead. Misjudging pushable-as-not costs only the write shape
    * (COW vs delete file), never correctness.
    */
  private def pushableDelete(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    // this rule runs at ANALYSIS time, before ConstantFolding: a type-
    // coerced literal is still Cast(Literal) here (e.g. `user_id IN
    // (101, ...)` against a bigint column). `foldable` is the right
    // test — exactly those expressions are literals by push-down time.
    // The ATTRIBUTE side tolerates exactly the WIDENING numeric casts
    // type coercion inserts (int column vs bigint literal wraps the
    // COLUMN too): Spark's UnwrapCastInBinaryComparison strips those
    // before the V2 filter translation, so they push fine. Any other
    // cast around the column defeats the translation → COW.
    import org.apache.spark.sql.types._
    def widening(from: DataType, to: DataType): Boolean = {
      val order: Seq[DataType] =
        Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
      val (f, t) = (order.indexOf(from), order.indexOf(to))
      (f >= 0 && t >= 0 && f <= t) || from == to ||
        (from.isInstanceOf[DecimalType] && to.isInstanceOf[DecimalType])
    }
    def attrSide(e: Expression): Boolean = e match {
      case _: AttributeReference => true
      case c: Cast => c.child.isInstanceOf[AttributeReference] &&
        widening(c.child.dataType, c.dataType)
      case _ => false
    }
    def al(a: Expression, b: Expression) =
      (attrSide(a) && b.foldable) || (a.foldable && attrSide(b))
    e match {
      case And(l, r) => pushableDelete(l) && pushableDelete(r)
      case Or(l, r) => pushableDelete(l) && pushableDelete(r)
      case Not(c) => pushableDelete(c)
      case EqualTo(a, b) => al(a, b)
      case EqualNullSafe(a, b) => al(a, b)
      case GreaterThan(a, b) => al(a, b)
      case GreaterThanOrEqual(a, b) => al(a, b)
      case LessThan(a, b) => al(a, b)
      case LessThanOrEqual(a, b) => al(a, b)
      case In(a, list) => attrSide(a) && list.forall(_.foldable)
      case InSet(a, _) => attrSide(a)
      case IsNull(_: AttributeReference) => true
      case IsNotNull(_: AttributeReference) => true
      case StartsWith(a, b) => al(a, b)
      case EndsWith(a, b) => al(a, b)
      case Contains(a, b) => al(a, b)
      case _: Literal => true
      case _ => false
    }
  }

  /** Decompose a DML condition's conjunction: if exactly one arm is an
    * uncorrelated `IN (SELECT ...)` over plain target columns, return
    * (target-key -> source-key pairs, DISTINCT'd subquery plan, the
    * remaining conjuncts recombined). The DISTINCT makes the semi-join
    * keys unique, which both matches IN semantics exactly and satisfies
    * the MERGE cardinality rule. More than one IN arm, IN over computed
    * expressions, or a correlated list query all fall through to
    * [[xlate]]'s explicit unsupported error.
    */
  private def extractInArm(
      cond: Expression, tSet: AttributeSet): Option[(Seq[(String, String)], LogicalPlan, Option[Expression])] = {
    import org.apache.spark.sql.catalyst.expressions.{InSubquery, ListQuery}
    val arms = splitConj(cond)
    val ins = arms.collect {
      case in @ InSubquery(values, lq: ListQuery)
          if lq.outerAttrs.isEmpty && lq.plan.resolved &&
            values.forall {
              case a: AttributeReference => tSet.contains(a)
              case _ => false
            } &&
            values.size == lq.plan.output.size =>
        in
    }
    ins match {
      case Seq(in @ InSubquery(values, lq: ListQuery)) =>
        val keys = values.map(_.asInstanceOf[AttributeReference].name)
          .zip(lq.plan.output.map(_.name))
        val rest = arms.filterNot(_ eq in)
        Some((keys, Distinct(lq.plan), rest.reduceOption(And)))
      case _ => None
    }
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
    *
    * UNCORRELATED SCALAR subqueries are supported: SQL evaluates them
    * once per statement, so they lift as a [[DeferredScalarSubquery]]
    * placeholder that the command materializes into a literal at RUN
    * time (never during analysis — EXPLAIN must not execute jobs, and
    * analyzer batches may re-enter). Correlated or multi-row subqueries
    * cannot be lifted — their attributes stay bound to the original
    * relations and would surface as a confusing "resolved attribute(s)
    * missing" analysis error downstream — so they are rejected with an
    * explicit unsupported-feature message.
    */
  private def xlate(e: Expression, tSet: AttributeSet, sSet: AttributeSet): Column = {
    val prepared = e.transform {
      case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery
          if s.outerAttrs.isEmpty && s.plan.resolved =>
        DeferredScalarSubquery(s.plan)
      case ex: org.apache.spark.sql.catalyst.expressions.Exists
          if ex.outerAttrs.isEmpty && ex.plan.resolved =>
        // uncorrelated EXISTS is a statement-level boolean (SQL
        // evaluates it once): defer to run time like scalar subqueries
        DeferredExistsSubquery(ex.plan)
    }
    if (prepared.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
      throw new UnsupportedOperationException(
        s"unsupported subquery shape in DML ($e): supported are uncorrelated " +
          "SCALAR and EXISTS subqueries anywhere in UPDATE/MERGE conditions " +
          "and assignments, and ONE uncorrelated `col IN (SELECT ...)` (over " +
          "plain target columns) as a top-level WHERE conjunct of UPDATE or " +
          "DELETE; for correlated or other forms, materialize the subquery " +
          "as a source table or temp view and use MERGE")
    GraftSqlShim.column(prepared.transform {
      case a: AttributeReference if sSet.contains(a) =>
        UnresolvedAttribute(Seq("__s", a.name))
      case a: AttributeReference if tSet.contains(a) =>
        if (sSet.isEmpty) UnresolvedAttribute(Seq(a.name))
        else UnresolvedAttribute(Seq("__t", a.name))
    })
  }

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
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is not supported; evolve the table first " +
        "(ALTER TABLE ADD COLUMN)")
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

    // ordered clauses, conditions included — the engine applies them
    // first-true-wins per row (SQL clause-order semantics)
    val matchedClauses: Seq[Merge.WhenMatched] = m.matchedActions.map {
      case us: UpdateStarAction =>
        Merge.WhenMatched(Merge.UpdateAll, us.condition.map(xlate(_, tSet, sSet)))
      case da: DeleteAction =>
        Merge.WhenMatched(Merge.Delete, da.condition.map(xlate(_, tSet, sSet)))
      case ua: UpdateAction =>
        Merge.WhenMatched(
          Merge.Update(ua.assignments.map(a =>
            topLevelName(a.key, "MERGE UPDATE") -> xlate(a.value, tSet, sSet)).toMap),
          ua.condition.map(xlate(_, tSet, sSet)))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action: $other")
    }

    val notMatchedClauses: Seq[Merge.WhenNotMatched] = m.notMatchedActions.map {
      case is: InsertStarAction =>
        Merge.WhenNotMatched(Merge.InsertAll, is.condition.map(xlate(_, tSet, sSet)))
      case ia: InsertAction =>
        Merge.WhenNotMatched(
          Merge.Insert(ia.assignments.map(a =>
            topLevelName(a.key, "MERGE INSERT") -> xlate(a.value, tSet, sSet)).toMap),
          ia.condition.map(xlate(_, tSet, sSet)))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }

    // the third MERGE arm: target rows no source row matches. Spark's
    // analyzer already restricts these conditions/assignments to target
    // references; xlate maps them into the rewrite's __t frame.
    val bySourceClauses: Seq[Merge.WhenNotMatchedBySource] =
      m.notMatchedBySourceActions.map {
        case da: DeleteAction =>
          Merge.WhenNotMatchedBySource(Merge.Delete, da.condition.map(xlate(_, tSet, sSet)))
        case ua: UpdateAction =>
          Merge.WhenNotMatchedBySource(
            Merge.Update(ua.assignments.map(a =>
              topLevelName(a.key, "MERGE UPDATE") -> xlate(a.value, tSet, sSet)).toMap),
            ua.condition.map(xlate(_, tSet, sSet)))
        case other => throw new UnsupportedOperationException(
          s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
      }

    GraftMergeCommand(t.snapTable, m.sourceTable, keys, matchedClauses,
      notMatchedClauses, bySourceClauses)
  }
}

/** Placeholder carrying an uncorrelated scalar subquery's resolved plan
  * through a lowered DML Column until command RUN time, where it
  * materializes into a literal — once per statement, SQL's contract
  * for uncorrelated scalar subqueries (0 rows → NULL, >1 rows → error).
  */
final case class DeferredScalarSubquery(
    @transient plan: LogicalPlan)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def dataType: org.apache.spark.sql.types.DataType = plan.output.head.dataType
  override def nullable: Boolean = true
}

object DeferredScalarSubquery {
  /** Evaluate every deferred subquery in `c` to a literal. */
  def materialize(spark: SparkSession, c: Column): Column =
    GraftSqlShim.column(GraftSqlShim.expression(c).transform {
      case DeferredScalarSubquery(p) =>
        val rows = GraftSqlShim.ofRows(spark, p).limit(2).collect()
        require(rows.length <= 1,
          "scalar subquery in UPDATE/MERGE returned more than one row")
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          if (rows.isEmpty) null else rows.head.get(0), p.output.head.dataType)
      case DeferredExistsSubquery(p) =>
        // one limit-1 probe; never NULL (so NOT EXISTS over an empty
        // subquery is TRUE, not unknown)
        org.apache.spark.sql.catalyst.expressions.Literal(
          GraftSqlShim.ofRows(spark, p).limit(1).collect().nonEmpty,
          org.apache.spark.sql.types.BooleanType)
    })
}

/** Placeholder carrying an uncorrelated EXISTS subquery's resolved plan
  * through a lowered DML Column until command RUN time, where one
  * limit-1 probe materializes it into a boolean literal.
  */
final case class DeferredExistsSubquery(
    @transient plan: LogicalPlan)
  extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with org.apache.spark.sql.catalyst.expressions.Unevaluable {
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = false
}

/** Executable lowering of `UPDATE graft.ns.t SET ... WHERE ...`. */
final case class GraftUpdateCommand(
    @transient table: SnapshotTable,
    cond: Option[Column],
    sets: Map[String, Column]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    // row-level DML is a WRITE under the per-team table matrix — the
    // analysis-time loadTable only established read access
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    def m(c: Column) = DeferredScalarSubquery.materialize(spark, c)
    table.updateWhere(spark, cond.map(m).getOrElse(lit(true)),
      sets.map { case (k, v) => k -> m(v) })
    Nil
  }
}

/** Executable lowering of `DELETE FROM graft.ns.t WHERE k IN (SELECT …)`
  * with no residual condition: the subquery's keys (already DISTINCT'd
  * by the lowering) become a MERGE-ON-READ equality delete — the same
  * contract a plain key-list DELETE gets through SupportsDelete:
  * O(|keys|) write cost, no data file rewritten, reads anti-join the
  * delete file. The key frame stays a distributed plan end-to-end;
  * nothing collects to the driver.
  */
final case class GraftDeleteInCommand(
    @transient table: SnapshotTable,
    @transient keysPlan: LogicalPlan,
    keys: Seq[(String, String)]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    val keyFrame = GraftSqlShim.ofRows(spark, keysPlan)
      .select(keys.map { case (tk, sk) =>
        org.apache.spark.sql.functions.col(sk).as(tk)
      }: _*)
    table.deleteWhere(keyFrame, keys.map(_._1))
    Nil
  }
}

/** Executable lowering of `DELETE FROM graft.ns.t WHERE <cond>` whose
  * condition carries deferred scalar/EXISTS subqueries (the DSv2 filter
  * push-down cannot cross those): statement-level subqueries
  * materialize to literals at run time, then the copy-on-write delete
  * rewrites only the dirs holding matching rows.
  */
final case class GraftDeleteWhereCommand(
    @transient table: SnapshotTable,
    cond: Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    table.deleteRows(spark, DeferredScalarSubquery.materialize(spark, cond))
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
    matchedClauses: Seq[Merge.WhenMatched],
    notMatchedClauses: Seq[Merge.WhenNotMatched],
    notMatchedBySourceClauses: Seq[Merge.WhenNotMatchedBySource] = Nil)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    def m(c: Column) = DeferredScalarSubquery.materialize(spark, c)
    table.mergeClauses(
      GraftSqlShim.ofRows(spark, sourcePlan), keys,
      matchedClauses.map(c => c.copy(
        action = c.action match {
          case Merge.Update(sets) => Merge.Update(sets.map { case (k, v) => k -> m(v) })
          case other => other
        },
        cond = c.cond.map(m))),
      notMatchedClauses.map(c => c.copy(
        action = c.action match {
          case Merge.Insert(sets) => Merge.Insert(sets.map { case (k, v) => k -> m(v) })
          case other => other
        },
        cond = c.cond.map(m))),
      notMatchedBySourceClauses.map(c => c.copy(
        action = c.action match {
          case Merge.Update(sets) => Merge.Update(sets.map { case (k, v) => k -> m(v) })
          case other => other
        },
        cond = c.cond.map(m))))
    Nil
  }
}
