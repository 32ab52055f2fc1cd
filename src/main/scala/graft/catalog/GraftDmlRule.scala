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
      condition.flatMap(extractSubqueryArm(_, tSet)) match {
        // UPDATE ... WHERE k IN (SELECT ...) / WHERE EXISTS (corr):
        // lower onto the MERGE engine path — the subquery's distinct
        // keys become the merge source, the IN / correlation equalities
        // become the key semi-join the COW detection already runs
        // broadcast + key-pruned, and residual conjuncts ride as the
        // matched clause's condition. Never a driver-side key collect:
        // at 100 TB the subquery result stays distributed.
        case Some((SemiArm, keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          GraftMergeCommand(t.snapTable, srcPlan, keys,
            matchedClauses = Seq(Merge.WhenMatched(
              Merge.Update(assignments.map(a =>
                topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, sSet)).toMap),
              rest.map(xlate(_, tSet, sSet)))),
            notMatchedClauses = Nil, modeProperty = "write.update.mode")
        // UPDATE ... WHERE NOT EXISTS (corr): the inverted detection —
        // exactly MERGE's third arm (WHEN NOT MATCHED BY SOURCE), an
        // anti-join of the broadcast subquery keys. NULL-keyed target
        // rows correctly update: no inner row can equal NULL, so NOT
        // EXISTS is true for them, and the anti-join keeps them too.
        case Some((AntiArm, keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          GraftMergeCommand(t.snapTable, srcPlan, keys,
            matchedClauses = Nil, notMatchedClauses = Nil,
            notMatchedBySourceClauses = Seq(Merge.WhenNotMatchedBySource(
              Merge.Update(assignments.map(a =>
                topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, sSet)).toMap),
              rest.map(xlate(_, tSet, sSet)))),
            modeProperty = "write.update.mode")
        // UPDATE ... WHERE k NOT IN (SELECT ...): null-aware semantics
        // branch at RUN time (a NULL in the subquery makes NOT IN never
        // TRUE; an empty subquery makes it TRUE everywhere; otherwise
        // it is the anti-join — MERGE's third arm — restricted to
        // non-NULL target keys, because `NULL NOT IN (non-empty)` is
        // UNKNOWN, and an anti-join alone would wrongly touch those rows)
        case Some((NotInArm, keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          val keyAttr = target.output.find(_.name == keys.head._1).get
          val antiCond = rest
            .map(And(org.apache.spark.sql.catalyst.expressions.IsNotNull(keyAttr), _))
            .getOrElse(org.apache.spark.sql.catalyst.expressions.IsNotNull(keyAttr))
          GraftNotInCommand(t.snapTable, srcPlan, keys,
            bySourceClause = Merge.WhenNotMatchedBySource(
              Merge.Update(assignments.map(a =>
                topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, sSet)).toMap),
              Some(xlate(antiCond, tSet, sSet))),
            plainCond = rest.map(xlate(_, tSet, AttributeSet.empty)),
            plainSets = Some(assignments.map(a =>
              topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, AttributeSet.empty)).toMap),
            modeProperty = "write.update.mode")
        // UPDATE ... WHERE (a, b, ...) NOT IN (SELECT ...): the same
        // run-time null-mask decomposition as the DELETE twin; matched
        // rows update through the COW/MOR matcher seam
        case Some((NotInMultiArm, keys, srcPlan, rest)) =>
          GraftNotInMultiUpdateCommand(t.snapTable, srcPlan, keys,
            sets = assignments.map(a => topLevelName(a.key, "UPDATE") ->
              xlate(a.value, tSet, AttributeSet.empty)).toMap,
            plainCond = rest.map(xlate(_, tSet, AttributeSet.empty)),
            modeProperty = "write.update.mode")
        case None =>
          lowerCorrScalarUpdate(t, assignments, condition, tSet).getOrElse(
            GraftUpdateCommand(
              t.snapTable,
              condition.map(xlate(_, tSet, AttributeSet.empty)),
              assignments.map(a =>
                topLevelName(a.key, "UPDATE") -> xlate(a.value, tSet, AttributeSet.empty)).toMap))
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
      extractSubqueryArm(condition, tSet) match {
        // pure key-membership delete (uncorrelated IN, or correlated
        // EXISTS whose correlation is the whole condition): the SAME
        // merge-on-read contract a literal key list gets — the distinct
        // keys become the equality-delete file, no data file rewritten
        case Some((SemiArm, keys, srcPlan, None)) =>
          GraftDeleteInCommand(t.snapTable, srcPlan, keys)
        case Some((SemiArm, keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          GraftMergeCommand(t.snapTable, srcPlan, keys,
            matchedClauses = Seq(Merge.WhenMatched(
              Merge.Delete, rest.map(xlate(_, tSet, sSet)))),
            notMatchedClauses = Nil, modeProperty = "write.delete.mode")
        // DELETE ... WHERE NOT EXISTS (corr): retire target rows with
        // no matching subquery row — MERGE's third arm (anti-join of
        // the broadcast keys), the full-sync retirement shape
        case Some((AntiArm, keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          GraftMergeCommand(t.snapTable, srcPlan, keys,
            matchedClauses = Nil, notMatchedClauses = Nil,
            notMatchedBySourceClauses = Seq(Merge.WhenNotMatchedBySource(
              Merge.Delete, rest.map(xlate(_, tSet, sSet)))),
            modeProperty = "write.delete.mode")
        // DELETE ... WHERE k NOT IN (SELECT ...): same run-time
        // null-aware branching as the UPDATE form above
        case Some((NotInArm, keys, srcPlan, rest)) =>
          val sSet = srcPlan.outputSet
          val keyAttr = target.output.find(_.name == keys.head._1).get
          val antiCond = rest
            .map(And(org.apache.spark.sql.catalyst.expressions.IsNotNull(keyAttr), _))
            .getOrElse(org.apache.spark.sql.catalyst.expressions.IsNotNull(keyAttr))
          GraftNotInCommand(t.snapTable, srcPlan, keys,
            bySourceClause = Merge.WhenNotMatchedBySource(
              Merge.Delete, Some(xlate(antiCond, tSet, sSet))),
            plainCond = rest.map(xlate(_, tSet, AttributeSet.empty)),
            plainSets = None,
            modeProperty = "write.delete.mode")
        // DELETE ... WHERE (a, b, ...) NOT IN (SELECT ...): exact
        // multi-column null-aware semantics via run-time null-mask
        // decomposition into equi anti-joins (see the command's doc)
        case Some((NotInMultiArm, keys, srcPlan, rest)) =>
          GraftNotInMultiDeleteCommand(t.snapTable, srcPlan, keys,
            plainCond = rest.map(xlate(_, tSet, AttributeSet.empty)),
            modeProperty = "write.delete.mode")
        case None => extractThetaExistsArm(condition, tSet) match {
          // correlated [NOT] EXISTS with theta residuals alongside its
          // equality correlation: the equalities key a real semi/anti
          // join (never a nested loop), the thetas ride it as extra
          // join conditions, and the matched ROW SET deletes through
          // the matcher seam (COW complement or one positional file)
          case Some((negated, srcPlan, keys, theta, rest)) =>
            GraftThetaExistsDeleteCommand(t.snapTable, srcPlan, keys, theta,
              negated, rest.map(xlate(_, tSet, AttributeSet.empty)),
              modeProperty = "write.delete.mode")
          case None =>
            // scalar/EXISTS-only subquery conditions: evaluate statement-
            // level via the deferred machinery on the UPDATE-free engine
            // delete path (deleteRows below translates through xlate and
            // rejects the unsupported forms with the actionable message)
            GraftDeleteWhereCommand(t.snapTable,
              xlate(condition, tSet, AttributeSet.empty))
        }
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

  /** Decompose a DML condition's conjunction: if exactly one arm is a
    * multi-row subquery the engine can lower as a JOIN — an
    * uncorrelated `IN (SELECT ...)` over plain target columns, a
    * correlated `IN`, or a correlated `[NOT] EXISTS` whose correlation
    * predicates are plain target-column = inner-column equalities —
    * return (semi/anti kind, target-key -> source-key pairs, DISTINCT'd
    * decorrelated subquery plan, the remaining conjuncts recombined).
    * The DISTINCT makes the join keys unique, which both matches
    * IN/EXISTS semantics exactly and satisfies the MERGE cardinality
    * rule (every key pair equates a target column, so a target row
    * matches at most ONE distinct source tuple). Multiple subquery
    * arms, NOT IN, or non-equality correlation all fall through to
    * [[xlate]]'s explicit unsupported error.
    */
  private def extractSubqueryArm(
      cond: Expression, tSet: AttributeSet)
      : Option[(ArmKind, Seq[(String, String)], LogicalPlan, Option[Expression])] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Exists, InSubquery, ListQuery, Not}
    val arms = splitConj(cond)
    // arms this extractor could lower (scalar / uncorrelated-EXISTS
    // arms are NOT counted — they stay in `rest` and defer through
    // xlate's run-time-literal machinery)
    def lowerable(e: Expression): Boolean = e.exists {
      case _: ListQuery => true
      case ex: Exists => ex.outerAttrs.nonEmpty
      case _ => false
    }
    val subArms = arms.filter(lowerable)
    if (subArms.size != 1) return None
    val arm = subArms.head
    val rest = arms.filterNot(_ eq arm).reduceOption(And)
    def targetAttr(e: Expression): Boolean = e match {
      case a: AttributeReference => tSet.contains(a)
      case _ => false
    }
    // alias every key column to a fresh stable name: inner attrs from
    // different relations may collide on name, and the merge path maps
    // keys by NAME across the source frame
    def build(kind: ArmKind, pairs: Seq[(AttributeReference, AttributeReference)],
        child: LogicalPlan): Option[(ArmKind, Seq[(String, String)], LogicalPlan, Option[Expression])] = {
      val aliased = pairs.map(_._2).zipWithIndex.map {
        case (a, i) => Alias(a, s"__gkey$i")()
      }
      Some((kind, pairs.map(_._1.name).zip(aliased.map(_.name)),
        Distinct(Project(aliased, child)), rest))
    }
    arm match {
      // uncorrelated IN over plain target columns
      case InSubquery(values, lq: ListQuery)
          if lq.outerAttrs.isEmpty && lq.plan.resolved &&
            values.forall(targetAttr) && values.size == lq.plan.output.size =>
        val keys = values.map(_.asInstanceOf[AttributeReference].name)
          .zip(lq.plan.output.map(_.name))
        Some((SemiArm, keys, Distinct(lq.plan), rest))
      // correlated IN: `t.k IN (SELECT x FROM s WHERE s.g = t.g ...)`
      // — the IN-match columns and the correlation equalities combine
      // into one semi-join key set
      case InSubquery(values, lq: ListQuery)
          if lq.outerAttrs.nonEmpty && lq.plan.resolved &&
            values.forall(targetAttr) && values.size == lq.plan.output.size =>
        for {
          (corr, child) <- decorrelate(lq.plan, tSet)
          inAttrs <- resolveThrough(lq.plan, lq.plan.output, child)
          r <- build(SemiArm,
            values.map(_.asInstanceOf[AttributeReference]).zip(inAttrs) ++ corr,
            child)
        } yield r
      // correlated EXISTS → semi-join on the correlation equalities
      case ex: Exists if ex.outerAttrs.nonEmpty && ex.plan.resolved =>
        decorrelate(ex.plan, tSet).flatMap { case (corr, child) =>
          build(SemiArm, corr, child)
        }
      // correlated NOT EXISTS → anti-join on the correlation equalities
      case Not(ex: Exists) if ex.outerAttrs.nonEmpty && ex.plan.resolved =>
        decorrelate(ex.plan, tSet).flatMap { case (corr, child) =>
          build(AntiArm, corr, child)
        }
      // uncorrelated single-column NOT IN: the null-aware shape. The
      // extractor only pairs the key columns; the caller owns the
      // three-way run-time semantics (NULL-in-subquery no-op / empty-
      // subquery TRUE / anti-join over non-NULL target keys)
      case Not(InSubquery(Seq(value), lq: ListQuery))
          if lq.outerAttrs.isEmpty && lq.plan.resolved &&
            targetAttr(value) && lq.plan.output.size == 1 =>
        val keyName = value.asInstanceOf[AttributeReference].name
        val aliased = Alias(lq.plan.output.head, "__gkey0")()
        Some((NotInArm, Seq(keyName -> "__gkey0"),
          Distinct(Project(Seq(aliased), lq.plan)), rest))
      // uncorrelated MULTI-column NOT IN: the same null-aware contract,
      // decomposed by null masks at RUN time into pure equi anti-joins
      // (GraftNotInMultiDeleteCommand) — never a nested-loop join
      case Not(InSubquery(values, lq: ListQuery))
          if values.size > 1 && lq.outerAttrs.isEmpty && lq.plan.resolved &&
            values.forall(targetAttr) && lq.plan.output.size == values.size =>
        val names = values.map(_.asInstanceOf[AttributeReference].name)
        val aliased = lq.plan.output.zipWithIndex.map {
          case (o, i) => Alias(o, s"__gkey$i")()
        }
        Some((NotInMultiArm, names.zip(aliased.map(_.name)),
          Distinct(Project(aliased, lq.plan)), rest))
      case _ => None
    }
  }

  /** `UPDATE t SET x = (SELECT agg(...) FROM s WHERE s.k = t.k) ...` —
    * a correlated SCALAR subquery in an assignment. Classic Kim
    * decorrelation: the global aggregate over the correlated filter
    * becomes a PER-KEY aggregate (grouped on the correlation columns,
    * which also makes the merge keys unique by construction), the
    * statement lowers onto the COW/MOR MERGE with the subquery node
    * substituted by the source's aggregate column in the matched arm —
    * and by the aggregate's EMPTY-GROUP value in a WHEN NOT MATCHED BY
    * SOURCE arm, because SQL gives keyless rows the empty-subquery
    * scalar and a semi-join alone would silently skip them. That value
    * is NULL for max/min/sum/avg but 0 for COUNT — the classic
    * count-bug — so the count arm replays the subquery's output
    * expression over a 0 literal (any Alias/Cast wrapper applies to it
    * exactly as it would to the aggregate); other aggregates keep the
    * actionable unsupported error rather than a silently-wrong rewrite.
    */
  private def lowerCorrScalarUpdate(
      t: GraftSparkTable,
      assignments: Seq[Assignment],
      condition: Option[Expression],
      tSet: AttributeSet): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, OuterReference, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{Average, AggregateExpression, Count, Max, Min, Sum}
    val subs = assignments.flatMap(_.value.collect {
      case s: ScalarSubquery if s.outerAttrs.nonEmpty => s
    }).distinct
    subs match {
      case Seq(sub) if sub.plan.resolved &&
          // the WHERE must carry no subquery of its own: combining a
          // lowered condition arm with a lowered assignment would need
          // two different merge sources
          condition.forall(!_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression])) =>
        def strip(p: LogicalPlan): LogicalPlan = p match {
          case SubqueryAlias(_, c) => strip(c)
          case other => other
        }
        strip(sub.plan) match {
          case Aggregate(Seq(), Seq(outExpr), aggChild, _) =>
            // the output must be the NULL-on-empty aggregate DIRECTLY
            // (under Alias/Cast only): any surrounding expression — a
            // COALESCE, CASE, arithmetic — can map the empty-group NULL
            // to a non-NULL value, and the BY SOURCE arm's Literal(null)
            // substitution would then be silently wrong for keyless rows
            // (the count-bug's general form)
            def bare(e: Expression): Expression = e match {
              case org.apache.spark.sql.catalyst.expressions.Alias(c, _) => bare(c)
              case c: org.apache.spark.sql.catalyst.expressions.Cast => bare(c.child)
              case other => other
            }
            // the value the keyless (empty-group) arm substitutes for
            // the subquery: NULL for the NULL-on-empty aggregates, the
            // wrapped 0 for COUNT, nothing (= refuse) otherwise
            val emptyGroupValue: Option[Expression] = bare(outExpr) match {
              case ae: AggregateExpression => ae.aggregateFunction match {
                case _: Max | _: Min | _: Sum | _: Average =>
                  Some(Literal.create(null, sub.dataType))
                case _: Count =>
                  val unAliased = outExpr match {
                    case Alias(c2, _) => c2
                    case other => other
                  }
                  Some(unAliased.transform {
                    case ae2: AggregateExpression
                        if ae2.aggregateFunction.isInstanceOf[Count] =>
                      Literal(0L)
                  })
                case _ => None
              }
              case _ => None
            }
            if (emptyGroupValue.isEmpty ||
              outExpr.exists(_.isInstanceOf[OuterReference])) None
            else decorrelate(aggChild, tSet).flatMap { case (pairs, child) =>
              val keyAls = pairs.map(_._2).zipWithIndex.map {
                case (a, i) => Alias(a, s"__gkey$i")()
              }
              val valAl = outExpr match {
                case Alias(c, _) => Alias(c, "__gval")()
                case other => Alias(other, "__gval")()
              }
              val srcPlan = Aggregate(pairs.map(_._2), keyAls :+ valAl, child, None)
              val keys = pairs.map(_._1.name).zip(keyAls.map(_.name))
              val sSet = srcPlan.outputSet
              def sets(repl: Expression): Map[String, Column] =
                assignments.map(a => topLevelName(a.key, "UPDATE") ->
                  xlate(a.value.transform {
                    case s2: ScalarSubquery if s2 == sub => repl
                  }, tSet, sSet)).toMap
              val cond = condition.map(xlate(_, tSet, sSet))
              Some(GraftMergeCommand(t.snapTable, srcPlan, keys,
                matchedClauses = Seq(Merge.WhenMatched(
                  Merge.Update(sets(valAl.toAttribute)), cond)),
                notMatchedClauses = Nil,
                notMatchedBySourceClauses = Seq(Merge.WhenNotMatchedBySource(
                  Merge.Update(sets(emptyGroupValue.get)), cond)),
                modeProperty = "write.update.mode"))
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Decorrelate an equality-correlated subquery plan: exactly one
    * Filter carries every outer reference; each of its outer-referencing
    * conjuncts must be a plain `inner-attr = outer(target-attr)`
    * equality (either order); every node ABOVE that Filter must be
    * row-set-preserving (Project / SubqueryAlias / Distinct — so
    * discarding them cannot change which key tuples exist); no nested
    * subquery anywhere (an outer reference hiding inside one would
    * escape the audit). Returns (target-attr -> inner-attr correlation
    * pairs, the Filter's child re-filtered by the inner-only conjuncts)
    * — i.e. exactly the relation a semi/anti join needs.
    */
  private def decorrelate(plan: LogicalPlan, tSet: AttributeSet)
      : Option[(Seq[(AttributeReference, AttributeReference)], LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.{OuterReference, SubqueryExpression}
    def outerCount(e: Expression): Int = {
      var n = 0
      e.foreach { case _: OuterReference => n += 1; case _ => () }
      n
    }
    if (plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[SubqueryExpression]))))
      return None
    val planOuter = plan.collect { case n => n }
      .map(_.expressions.map(outerCount).sum).sum
    val corrFilters = plan.collect {
      case f: Filter if outerCount(f.condition) > 0 => f
    }
    corrFilters match {
      case Seq(f) if outerCount(f.condition) == planOuter =>
        // every node above the filter must preserve the key-tuple set
        def pathOk(p: LogicalPlan): Boolean = p match {
          case x if x eq f => true
          case Project(_, child) => pathOk(child)
          case SubqueryAlias(_, child) => pathOk(child)
          case Distinct(child) => pathOk(child)
          case _ => false
        }
        if (!pathOk(plan)) return None
        val (corrArms, innerArms) = splitConj(f.condition).partition(outerCount(_) > 0)
        val pairs = corrArms.map {
          case EqualTo(a: AttributeReference, OuterReference(o: AttributeReference))
              if tSet.contains(o) && f.child.outputSet.contains(a) => Some(o -> a)
          case EqualTo(OuterReference(o: AttributeReference), a: AttributeReference)
              if tSet.contains(o) && f.child.outputSet.contains(a) => Some(o -> a)
          case _ => None
        }
        if (pairs.exists(_.isEmpty)) None
        else Some((pairs.flatten,
          innerArms.reduceOption(And).map(Filter(_, f.child)).getOrElse(f.child)))
      case _ => None
    }
  }

  /** [[decorrelate]]'s relaxation for EXISTS semantics: the correlated
    * Filter's outer-referencing conjuncts split into plain equalities
    * (the join KEYS — at least one is required, so the lowered join is
    * always equi-keyed, never a nested loop) and arbitrary THETA
    * residuals (`s.ts < t.ts`, `s.v > t.bal / 2`, ...), which ride the
    * same join as extra conditions. Safe for [NOT] EXISTS only: row
    * multiplicity is irrelevant there, so duplicate key tuples across
    * distinct theta values cannot change the answer the way they would
    * break a MERGE-cardinality lowering. Each theta conjunct must be
    * closed over the two relations: outer references wrap plain target
    * attributes, every other attribute belongs to the subquery child.
    * Returns (equality pairs, theta conjuncts, inner-filtered child).
    */
  private def decorrelateTheta(plan: LogicalPlan, tSet: AttributeSet)
      : Option[(Seq[(AttributeReference, AttributeReference)],
          Seq[Expression], LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.expressions.{OuterReference, SubqueryExpression}
    def outerCount(e: Expression): Int = {
      var n = 0
      e.foreach { case _: OuterReference => n += 1; case _ => () }
      n
    }
    if (plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[SubqueryExpression]))))
      return None
    val planOuter = plan.collect { case n => n }
      .map(_.expressions.map(outerCount).sum).sum
    val corrFilters = plan.collect {
      case f: Filter if outerCount(f.condition) > 0 => f
    }
    corrFilters match {
      case Seq(f) if outerCount(f.condition) == planOuter =>
        def pathOk(p: LogicalPlan): Boolean = p match {
          case x if x eq f => true
          case Project(_, child) => pathOk(child)
          case SubqueryAlias(_, child) => pathOk(child)
          case Distinct(child) => pathOk(child)
          case _ => false
        }
        if (!pathOk(plan)) return None
        val (corrArms, innerArms) = splitConj(f.condition).partition(outerCount(_) > 0)
        def asPair(e: Expression): Option[(AttributeReference, AttributeReference)] =
          e match {
            case EqualTo(a: AttributeReference, OuterReference(o: AttributeReference))
                if tSet.contains(o) && f.child.outputSet.contains(a) => Some(o -> a)
            case EqualTo(OuterReference(o: AttributeReference), a: AttributeReference)
                if tSet.contains(o) && f.child.outputSet.contains(a) => Some(o -> a)
            case _ => None
          }
        def closedTheta(e: Expression): Boolean = {
          var ok = true
          def walk(x: Expression): Unit = x match {
            case OuterReference(o: AttributeReference) =>
              if (!tSet.contains(o)) ok = false
            case _: OuterReference => ok = false
            case a: AttributeReference =>
              if (!f.child.outputSet.contains(a)) ok = false
            case other => other.children.foreach(walk)
          }
          walk(e); ok
        }
        val (pairs, thetas) = corrArms.partitionMap(e =>
          asPair(e).toLeft(e))
        if (pairs.isEmpty || thetas.isEmpty || !thetas.forall(closedTheta)) None
        else Some((pairs, thetas,
          innerArms.reduceOption(And).map(Filter(_, f.child)).getOrElse(f.child)))
      case _ => None
    }
  }

  /** DELETE-only companion to [[extractSubqueryArm]], tried after it
    * declines: exactly ONE conjunct is a correlated `[NOT] EXISTS` whose
    * correlation mixes plain equalities with theta residuals
    * ([[decorrelateTheta]]). Returns (negated, source plan projecting
    * `__gkeyN` key + `__gresN` theta columns, target-col -> key-col
    * pairs, the theta join condition over `__t`/`__s` frames, remaining
    * plain conjuncts). UPDATE keeps the refusal: its MERGE lowering
    * needs key-unique sources, which theta duplicates would break.
    */
  private def extractThetaExistsArm(cond: Expression, tSet: AttributeSet)
      : Option[(Boolean, LogicalPlan, Seq[(String, String)], Column, Option[Expression])] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Exists, ListQuery, Not, OuterReference}
    val arms = splitConj(cond)
    def lowerable(e: Expression): Boolean = e.exists {
      case _: ListQuery => true
      case ex: Exists => ex.outerAttrs.nonEmpty
      case _ => false
    }
    val subArms = arms.filter(lowerable)
    if (subArms.size != 1) return None
    val rest = arms.filterNot(_ eq subArms.head).reduceOption(And)
    val (negated, ex) = subArms.head match {
      case Not(e: Exists) if e.outerAttrs.nonEmpty && e.plan.resolved => (true, e)
      case e: Exists if e.outerAttrs.nonEmpty && e.plan.resolved => (false, e)
      case _ => return None
    }
    decorrelateTheta(ex.plan, tSet).map { case (pairs, thetas, child) =>
      val keyAls = pairs.map(_._2).zipWithIndex.map {
        case (a, i) => Alias(a, s"__gkey$i")()
      }
      // inner attributes the thetas reference (NOT the ones inside
      // OuterReference wrappers — those are target-side), aliased into
      // the source frame under collision-free names
      def innerRefs(e: Expression): Seq[AttributeReference] = e match {
        case OuterReference(_) => Nil
        case a: AttributeReference => Seq(a)
        case other => other.children.flatMap(innerRefs)
      }
      val resAttrs = thetas.flatMap(innerRefs).distinct
      val resAls = resAttrs.zipWithIndex.map {
        case (a, i) => Alias(a, s"__gres$i")()
      }
      val resMap = resAttrs.map(_.exprId).zip(resAls.map(_.name)).toMap
      // no Distinct: semi/anti joins are duplicate-insensitive, and a
      // distinct over keys+thetas would buy one extra shuffle for nothing
      val srcPlan = Project(keyAls ++ resAls, child)
      val theta = GraftSqlShim.column(thetas.map(_.transform {
        case OuterReference(a: AttributeReference) =>
          UnresolvedAttribute(Seq("__t", a.name))
        case a: AttributeReference if resMap.contains(a.exprId) =>
          UnresolvedAttribute(Seq("__s", resMap(a.exprId)))
      }).reduce(And))
      (negated, srcPlan: LogicalPlan,
        pairs.map(_._1.name).zip(keyAls.map(_.name)), theta, rest)
    }
  }

  /** Trace `attrs` (output attributes of `plan`) down through the
    * row-preserving nodes to attributes available at `stop`'s level
    * (the decorrelated child — `stop` must be reachable through
    * Project-of-attrs / SubqueryAlias / Distinct only).
    */
  private def resolveThrough(
      plan: LogicalPlan,
      attrs: Seq[org.apache.spark.sql.catalyst.expressions.Attribute],
      stop: LogicalPlan): Option[Seq[AttributeReference]] = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    def walk(p: LogicalPlan,
        cur: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
        : Option[Seq[AttributeReference]] = p match {
      case _ if cur.forall(a => stop.outputSet.contains(a)) =>
        Some(cur.map(_.asInstanceOf[AttributeReference]))
      case Project(list, child) =>
        val byId = list.map(ne => ne.toAttribute.exprId -> ne).toMap
        val mapped = cur.map(a => byId.get(a.exprId) match {
          case Some(ar: AttributeReference) => Some(ar)
          case Some(Alias(ar: AttributeReference, _)) => Some(ar)
          case _ => None
        })
        if (mapped.exists(_.isEmpty)) None else walk(child, mapped.flatten)
      case SubqueryAlias(_, child) => walk(child, cur)
      case Distinct(child) => walk(child, cur)
      case Filter(_, child) => walk(child, cur)
      case _ => None
    }
    walk(plan, attrs)
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
          "and assignments, and ONE top-level WHERE conjunct of UPDATE or " +
          "DELETE that is `col IN (SELECT ...)` (over plain target columns, " +
          "correlated or not), `[(]col[, ...)] NOT IN (SELECT ...)` " +
          "(uncorrelated, full null-aware semantics, single- or " +
          "multi-column), a correlated `[NOT] EXISTS` on plain column-equality " +
          "correlation (DELETE additionally accepts non-equality theta " +
          "conjuncts beside at least one equality), or an UPDATE assignment " +
          "whose value is a correlated scalar max/min/sum/avg/count over " +
          "plain equality correlation; for correlated NOT IN, purely " +
          "non-equality correlation, or other forms, materialize the " +
          "subquery as a source table or temp view and use MERGE")
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

/** Join kind a lowered DML subquery arm maps to: [[SemiArm]] (IN /
  * EXISTS — rows WITH a key match) or [[AntiArm]] (NOT EXISTS — rows
  * WITHOUT one, MERGE's third arm).
  */
sealed trait ArmKind
case object SemiArm extends ArmKind
case object AntiArm extends ArmKind
/** Uncorrelated NOT IN — anti-join SHAPE but null-aware SEMANTICS, so it
  * lowers to [[GraftNotInCommand]]'s run-time branch, not a plain anti.
  */
case object NotInArm extends ArmKind

/** Uncorrelated MULTI-column NOT IN — null-aware per COLUMN, not per
  * tuple: a source row that is NULL in one column can still be
  * definitely-different on another, so the single-column three-branch
  * classification does not carry over. Lowers to
  * [[GraftNotInMultiDeleteCommand]]'s null-mask decomposition.
  */
case object NotInMultiArm extends ArmKind

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

/** Executable lowering of `UPDATE graft.ns.t SET ... WHERE ...`. The
  * write shape follows Iceberg's `write.update.mode` table property:
  * `copy-on-write` (the default) rewrites only the files holding
  * matched rows; `merge-on-read` pairs a positional delete with an
  * append of the updated rows in one atomic commit — O(matched rows),
  * no file rewritten.
  */
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
    if (table.properties.get("write.update.mode").contains("merge-on-read"))
      table.updatePositions(spark, cond.map(m).getOrElse(lit(true)),
        sets.map { case (k, v) => k -> m(v) })
    else
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
  * condition cannot ride the DSv2 filter push-down (deferred scalar/
  * EXISTS subqueries, arbitrary expressions): statement-level
  * subqueries materialize to literals at run time, then the write shape
  * follows Iceberg's `write.delete.mode` table property —
  * `copy-on-write` (the default) rewrites only the files holding
  * matching rows; `merge-on-read` writes a POSITIONAL delete file
  * instead (O(matched rows), zero data files rewritten — the
  * delete-often/read-rarely shape).
  */
final case class GraftDeleteWhereCommand(
    @transient table: SnapshotTable,
    cond: Column) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    val c = DeferredScalarSubquery.materialize(spark, cond)
    if (table.properties.get("write.delete.mode").contains("merge-on-read"))
      table.deletePositions(spark, c)
    else table.deleteRows(spark, c)
    Nil
  }
}

/** Executable lowering of `UPDATE/DELETE ... WHERE k NOT IN (SELECT …)`
  * — SQL's null-aware NOT IN, branched at RUN time with two limit-1
  * probes of the (DISTINCT'd) subquery keys:
  *  - any NULL key → `k <> NULL` is UNKNOWN for every row, so NOT IN is
  *    never TRUE: the whole statement is a no-op;
  *  - empty subquery → NOT IN is TRUE for EVERY row (NULL target keys
  *    included): run the plain engine update/delete with the residual
  *    condition only;
  *  - otherwise → MERGE's third arm (WHEN NOT MATCHED BY SOURCE), an
  *    anti-join of the key frame, with `k IS NOT NULL` folded into the
  *    clause condition (a NULL target key against a non-empty list is
  *    UNKNOWN — the anti-join alone would wrongly touch those rows).
  * The key frame stays a distributed plan; nothing but the two one-row
  * probes ever reaches the driver.
  */
final case class GraftNotInCommand(
    @transient table: SnapshotTable,
    @transient keysPlan: LogicalPlan,
    keys: Seq[(String, String)],
    bySourceClause: Merge.WhenNotMatchedBySource,
    plainCond: Option[Column],
    plainSets: Option[Map[String, Column]],
    modeProperty: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    import org.apache.spark.sql.functions.col
    def m(c: Column) = DeferredScalarSubquery.materialize(spark, c)
    // ONE evaluation of the subquery key frame feeds the NULL probe,
    // the empty probe, AND the merge source: a non-deterministic
    // subquery must not be classified by one evaluation and applied
    // from another (same localCheckpoint discipline as
    // SnapshotTable.materializeSource; lazy — simple deterministic
    // scans still cost one job, paid by the first probe)
    val src = SourcePin.pin(spark, keysPlan)
    val kCol = keys.head._2
    // ONE aggregate job classifies the statement (count(*) vs
    // count(kCol) — their difference is the NULL-key count): the frame
    // is delta-sized and localCheckpoint-pinned, so a full-pass
    // aggregate costs less than the two limit-1 driver round-trips it
    // replaces on every UPDATE/DELETE-with-subquery statement
    val probe = src.agg(
      org.apache.spark.sql.functions.count(lit(1)).as("n"),
      org.apache.spark.sql.functions.count(col(kCol)).as("nn")).head()
    if (probe.getLong(0) > probe.getLong(1)) return Nil // a NULL key: no-op
    if (probe.getLong(0) == 0L) {
      val mor = table.properties.get(modeProperty).contains("merge-on-read")
      plainSets match {
        case Some(sets) =>
          val c = plainCond.map(m).getOrElse(lit(true))
          val s2 = sets.map { case (k, v) => k -> m(v) }
          if (mor) table.updatePositions(spark, c, s2)
          else table.updateWhere(spark, c, s2)
        case None =>
          val c = plainCond.map(m).getOrElse(lit(true))
          if (mor) table.deletePositions(spark, c)
          else table.deleteRows(spark, c)
      }
    } else {
      // the merge consumes the SAME (possibly checkpointed) frame the
      // probes classified — never a fresh evaluation of keysPlan
      GraftMergeCommand(table, src.queryExecution.analyzed, keys,
        matchedClauses = Nil, notMatchedClauses = Nil,
        notMatchedBySourceClauses = Seq(bySourceClause),
        modeProperty = modeProperty).run(spark)
    }
    Nil
  }
}

/** Executable lowering of `DELETE FROM graft.ns.t WHERE (a, b, ...) NOT
  * IN (SELECT x, y, ... FROM s)` — EXACT SQL null-aware semantics for
  * the multi-column form, which is null-aware per COLUMN: a target row
  * deletes iff EVERY source row is definitely different, i.e. differs
  * on at least one column where both sides are non-NULL. The naive
  * lowering is a non-equi anti-join (`(a<=>x OR a IS NULL OR x IS
  * NULL) AND ...`) that Spark can only execute as a nested-loop join —
  * O(target × source), forbidden engine-wide. Instead the row set
  * decomposes by NULL MASK:
  *
  *  - a target row with null-mask Q is "possibly equal" to a source row
  *    with null-mask P iff they agree on the columns where BOTH are
  *    non-null, `comp(P|Q)` — a pure EQUI join key once (P, Q) is fixed;
  *  - distinct masks are data-driven but bounded by 2^k (k = statement
  *    key count, tiny), and in the overwhelmingly common all-non-null
  *    case there is exactly ONE (P, Q) pair — a single struct-shaped
  *    broadcast anti-join;
  *  - deleted = for each Q: target[Q] anti-joined against each source
  *    mask's distinct `comp(P|Q)` projection in turn; a pair with NO
  *    both-non-null column means every source row of that mask blocks
  *    every target row of Q (equality never FALSE) — the piece empties.
  *
  * Statement-level short-circuits mirror the single-column command: an
  * empty subquery makes NOT IN TRUE everywhere (the residual condition
  * alone decides), and an all-NULL source tuple blocks every row (one
  * metadata-cheap mask probe, then no-op). The write shape follows
  * `write.delete.mode`: COW rewrites only affected dirs (kept rows =
  * exact multiset complement), merge-on-read writes one positional
  * delete file — both through the matcher seam, never a table rewrite.
  */
final case class GraftNotInMultiDeleteCommand(
    @transient table: SnapshotTable,
    @transient keysPlan: LogicalPlan,
    keys: Seq[(String, String)],
    plainCond: Option[Column],
    modeProperty: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    import org.apache.spark.sql.functions.lit
    val mor = table.properties.get(modeProperty).contains("merge-on-read")
    val rest = plainCond.map(DeferredScalarSubquery.materialize(spark, _))
    NotInMultiRuntime.classify(spark, keysPlan, keys, rest) match {
      case NotInMultiRuntime.NoOp => ()
      case NotInMultiRuntime.EverywhereTrue =>
        // empty subquery: NOT IN is TRUE for every row (null keys too)
        val c = rest.getOrElse(lit(true))
        if (mor) table.deletePositions(spark, c) else table.deleteRows(spark, c)
      case NotInMultiRuntime.Matched(matcher) =>
        if (mor) table.deletePositionsMatching(spark, matcher)
        else table.deleteRowsMatching(spark, matcher)
    }
    Nil
  }
}

/** Executable lowering of `UPDATE ... SET ... WHERE (a, b, ...) NOT IN
  * (SELECT …)` — the UPDATE twin of [[GraftNotInMultiDeleteCommand]]:
  * identical run-time null-mask classification (no-op on an all-NULL
  * source tuple, plain update on an empty subquery, the per-mask
  * equi-anti-join matcher otherwise); the matched row set updates
  * through the matcher seam — COW dir rewrite or MOR positional delete
  * + append per `write.update.mode`.
  */
final case class GraftNotInMultiUpdateCommand(
    @transient table: SnapshotTable,
    @transient keysPlan: LogicalPlan,
    keys: Seq[(String, String)],
    sets: Map[String, Column],
    plainCond: Option[Column],
    modeProperty: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    import org.apache.spark.sql.functions.lit
    val mor = table.properties.get(modeProperty).contains("merge-on-read")
    def m(c: Column) = DeferredScalarSubquery.materialize(spark, c)
    val rest = plainCond.map(m)
    val matSets = sets.map { case (k2, v) => k2 -> m(v) }
    NotInMultiRuntime.classify(spark, keysPlan, keys, rest) match {
      case NotInMultiRuntime.NoOp => ()
      case NotInMultiRuntime.EverywhereTrue =>
        val c = rest.getOrElse(lit(true))
        if (mor) table.updatePositions(spark, c, matSets)
        else table.updateWhere(spark, c, matSets)
      case NotInMultiRuntime.Matched(matcher) =>
        if (mor) table.updatePositionsMatching(spark, matcher, matSets)
        else table.updateRowsMatching(spark, matcher, matSets)
    }
    Nil
  }
}

/** One-evaluation discipline for DML source subqueries, shared by the
  * NOT IN / theta-EXISTS command runtimes: a source that can change
  * between evaluations must not be classified by one evaluation and
  * joined from another (the matcher seams apply it several times —
  * detection, split, complement). The determinism probe descends into
  * NESTED subquery plans (`SubqueryExpression.deterministic` does not
  * reflect its inner plan, and `plan.exists` does not traverse it), so
  * a rand() hiding inside a scalar subquery still pins. Lazy
  * checkpoint: simple deterministic scans stay streaming and cost
  * nothing extra; the first probe materializes a pinned copy otherwise.
  */
private[catalog] object SourcePin {
  private def planDeterministic(p: LogicalPlan): Boolean =
    !p.exists(_.expressions.exists(_.exists {
      case sub: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        !planDeterministic(sub.plan)
      case e => !e.deterministic
    }))

  def pin(spark: SparkSession, plan: LogicalPlan): org.apache.spark.sql.DataFrame = {
    val src0 = GraftSqlShim.ofRows(spark, plan)
    if (planDeterministic(src0.queryExecution.analyzed)) src0
    else src0.localCheckpoint(eager = false)
  }
}

/** Run-time null-mask classification + matcher shared by the
  * multi-column NOT IN DELETE and UPDATE commands. NOT IN is null-aware
  * per COLUMN: distinct source null masks (≤2^k, data-driven) each pair
  * with every target null mask into a pure equi anti-join over the
  * both-non-null columns — never a nested-loop join. An all-NULL source
  * tuple makes the statement a no-op; an empty subquery makes NOT IN
  * TRUE everywhere (the caller falls back to its plain predicate path).
  */
private[catalog] object NotInMultiRuntime {
  sealed trait Plan
  case object NoOp extends Plan
  case object EverywhereTrue extends Plan
  final case class Matched(
      matcher: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
    extends Plan

  def classify(
      spark: SparkSession,
      keysPlan: LogicalPlan,
      keys: Seq[(String, String)],
      rest: Option[Column]): Plan = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, when}
    val k = keys.size
    // same one-evaluation discipline as GraftNotInCommand: the mask
    // probe and every per-mask projection must see the SAME rows
    val src = SourcePin.pin(spark, keysPlan)
    def maskOf(cols: Seq[Column]): Column =
      cols.zipWithIndex.map { case (c, i) =>
        when(c.isNull, 1 << i).otherwise(0)
      }.reduce(_ + _)
    val srcMask = maskOf(keys.map { case (_, sk) => col(sk) })
    val srcMasks = src.select(srcMask.as("__gmask")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (srcMasks.isEmpty) return EverywhereTrue
    if (srcMasks.contains((1 << k) - 1)) return NoOp // all-NULL source tuple
    // target pieces: the matcher closure re-applies against a NEWER
    // probe after a commit-retry conflict, so the mask set must derive
    // from the frame IN HAND, never a scan taken here that a rival
    // commit could stale-out. Narrow tuples (k<=4, at most 16 masks)
    // enumerate statically — an unpopulated mask is an empty piece, and
    // the probe is NOT free: it is a distinct+collect scan of the
    // target that the matcher pays 2-3 times per statement
    // (affected-dir detection, rewrite split, kept-rows complement).
    // Wider tuples scan the live probe inside the closure (derived from
    // `df`, so retry-safe for free): real data populates FEW masks, and
    // enumerating 2^k pieces each carrying up to |srcMasks| anti-joins
    // plus a 2^k-way union builds a far larger plan than the probe
    // costs at that width
    val tgtMasksOf: org.apache.spark.sql.DataFrame => Seq[Int] =
      if (k <= 4) _ => 0 until (1 << k)
      else df => df
        .select(maskOf(keys.map { case (tk, _) => col(tk) }).as("__gmask"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
    Matched { df =>
      val tgtMasks = tgtMasksOf(df)
      val pieces = tgtMasks.map { q =>
        val qCond = keys.map(_._1).zipWithIndex.map { case (c, i) =>
          if ((q & (1 << i)) != 0) col(c).isNull else col(c).isNotNull
        }.reduce(_ && _)
        var rows = df.filter(qCond)
        srcMasks.foreach { p =>
          val u = (0 until k).filter(i => ((p | q) & (1 << i)) == 0)
          if (u.isEmpty)
            // no both-non-null column: every src[p] row possibly equals
            // every target[q] row — nothing in this piece can match
            rows = rows.filter(lit(false))
          else {
            val proj = src.filter(srcMask === p)
              .select(u.map(i => col(keys(i)._2)): _*).distinct()
            val joinCond = u.map(i => rows(keys(i)._1) === proj(keys(i)._2))
              .reduce(_ && _)
            rows = rows.join(broadcast(proj), joinCond, "left_anti")
          }
        }
        rows
      }
      val candidates = pieces.reduce(_ unionByName _)
      rest.map(candidates.filter).getOrElse(candidates)
    }
  }
}

/** Executable lowering of `DELETE ... WHERE [NOT] EXISTS (SELECT ...
  * WHERE s.k = t.k AND s.x < t.y ...)` — correlated EXISTS whose
  * correlation carries non-equality THETA conjuncts beside its
  * equalities. The equalities key a distributed semi (EXISTS) or anti
  * (NOT EXISTS) join; the thetas are extra conditions ON that join, so
  * the plan stays an equi-join (sort-merge or broadcast-hash under
  * Catalyst's sizing), never a nested loop. The matched row set then
  * deletes through the matcher seam: COW rewrites only the affected
  * dirs (multiset complement), merge-on-read writes one positional
  * delete file. EXISTS row-multiplicity semantics make the undistinct'd
  * source safe: a target row joins at most once into a semi/anti join
  * regardless of how many source rows satisfy the condition.
  */
final case class GraftThetaExistsDeleteCommand(
    @transient table: SnapshotTable,
    @transient srcPlan: LogicalPlan,
    keys: Seq[(String, String)],
    theta: Column,
    negated: Boolean,
    plainCond: Option[Column],
    modeProperty: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    import org.apache.spark.sql.functions.col
    // one-evaluation discipline (as NotInMultiRuntime): the matcher is
    // applied several times (affected-dir detection, the rewrite split,
    // the kept-rows complement) — a nondeterministic source must see
    // the SAME rows in each, or the COW rewrite corrupts
    val src = SourcePin.pin(spark, srcPlan).alias("__s")
    val rest = plainCond.map(DeferredScalarSubquery.materialize(spark, _))
    val matcher: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = { df =>
      val pre = rest.map(df.filter).getOrElse(df)
      val joinCond = (keys.map { case (tk, sk) =>
        col(s"__t.$tk") === col(s"__s.$sk") } :+ theta).reduce(_ && _)
      pre.alias("__t").join(src, joinCond,
        if (negated) "left_anti" else "left_semi")
    }
    if (table.properties.get(modeProperty).contains("merge-on-read"))
      table.deletePositionsMatching(spark, matcher)
    else table.deleteRowsMatching(spark, matcher)
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
    notMatchedBySourceClauses: Seq[Merge.WhenNotMatchedBySource] = Nil,
    // which Iceberg write-mode property routes this statement: a real
    // MERGE follows write.merge.mode, but a subquery-shaped UPDATE or
    // DELETE lowered onto the merge engine must keep following ITS
    // verb's property (write.update.mode / write.delete.mode) — the
    // user configured the verb, not the lowering
    modeProperty: String = "write.merge.mode")
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    graft.governance.AccessControl.checkTableAccess(spark,
      table.fullName.split("\\.", 2).last, table.fullName, "write")
    def m(c: Column) = DeferredScalarSubquery.materialize(spark, c)
    // Iceberg's write.merge.mode: merge-on-read pairs a positional
    // delete of touched rows with the rewritten/inserted append in one
    // commit; copy-on-write (default) rewrites the touched files
    val engine: (org.apache.spark.sql.DataFrame, Seq[(String, String)],
        Seq[Merge.WhenMatched], Seq[Merge.WhenNotMatched],
        Seq[Merge.WhenNotMatchedBySource]) => Any =
      if (table.properties.get(modeProperty).contains("merge-on-read"))
        table.mergeClausesMor(_, _, _, _, _)
      else table.mergeClauses(_, _, _, _, _)
    engine(
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
