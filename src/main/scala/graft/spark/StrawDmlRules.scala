package graft.spark

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.sources.Filter

/** SQL `UPDATE` and `MERGE INTO` for strawboat tables.
  *
  * Spark's generic path for these statements requires
  * `SupportsRowLevelOperations` (a scan/replace handshake built for
  * copy-on-write file groups). The engine already has STRONGER native
  * machinery — [[StrawUpdate]] evaluates assignments against deletion-vector
  * merge-on-read and [[StrawMerge]] bucket-joins on zone-map-pruned key
  * ranges — so, Delta-style, a post-hoc resolution rule rewrites the
  * analyzed [[UpdateTable]] / [[MergeIntoTable]] plans into eager commands
  * over that machinery instead:
  *
  * {{{
  * UPDATE straw.t SET name = upper(name), n = n + 1 WHERE id > 5
  * MERGE INTO straw.t USING updates AS u ON t.id = u.id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * MERGE routes by shape: the unconditional star forms (`UPDATE SET *` /
  * `DELETE` / `INSERT *` over same-named equi-keys) take [[StrawMerge]]'s
  * key-pruned broadcast/shuffle machinery; everything richer — conditional
  * and multiple WHEN clauses, partial assignments, partial inserts,
  * conditional NOT MATCHED BY SOURCE update/delete, renamed keys — takes
  * the generalized scan-join path ([[StrawMergeScan]]). Still refused
  * loudly (never approximated): non-equi join conditions, subqueries in
  * clauses, nested assignment targets, WITH SCHEMA EVOLUTION. UPDATE
  * conditions must translate to the v1 filter algebra AND compile exactly
  * in [[RowFilterEval]], the same obligation every other mutation surface
  * carries — or they route to the scan-based fallback.
  */
class StrawDmlRules(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(StrawRelation(rel, table), assignments, condition)
        if u.resolved =>
      StrawDml.rewriteUpdate(table, rel, assignments, condition)
    case m @ MergeIntoTable(StrawRelation(rel, table), source, cond,
        matched, notMatched, notMatchedBySource, _)
        if m.resolved =>
      // WITH SCHEMA EVOLUTION needs no handling here: by the time the plan
      // resolves, ResolveMergeIntoSchemaEvolution has already applied the
      // missing columns / widenings through the catalog's ALTER machinery
      // (gated on the AUTOMATIC_SCHEMA_EVOLUTION capability) and `rel`
      // carries the evolved schema.
      // Target columns in TABLE-SCHEMA order (outputSet iteration order is
      // arbitrary, and the general path writes rows in this order).
      StrawMergeCommand(table.tablePath, table.pinnedVersion, rel, source,
        rel.output, cond, matched, notMatched,
        notMatchedBySource)
    // DELETE whose condition translates to the v1 algebra rides Spark's own
    // SupportsDelete path (untouched — spec-pinned fast path); anything
    // beyond it (subqueries, complex expressions) would fail Spark's
    // translation, so it reroutes to the scan-based fallback instead
    case d @ DeleteFromTable(StrawRelation(rel, table), condition)
        if d.resolved && !StrawDml.nativeDeleteSupported(table, condition) =>
      require(condition.deterministic,
        "strawboat: DELETE condition must be deterministic")
      StrawDeleteScanCommand(table.tablePath, table.pinnedVersion,
        StrawScanDml.planWithMeta(rel, condition, Nil))
    case _ => plan
  }

  private object StrawRelation {
    def unapply(plan: LogicalPlan): Option[(DataSourceV2Relation, StrawboatTable)] =
      plan match {
        case r: DataSourceV2Relation => r.table match {
          case t: StrawboatTable => Some((r, t))
          case _ => None
        }
        // UPDATE/MERGE targets may carry an alias
        case SubqueryAlias(_, child) => unapply(child)
        case _ => None
      }
  }
}

private[spark] object StrawDml {

  /** Flatten an And-conjunction into its conjuncts — shared by the filter
    * translation AND both merge paths' key extraction, which must agree
    * for fast-vs-general routing to be sound. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Does the condition fully translate to v1 filters the table's native
    * SupportsDelete path accepts? (The scan-based fallback handles the
    * rest.) */
  def nativeDeleteSupported(table: StrawboatTable, cond: Expression): Boolean =
    tryFilters(cond).exists(fs => table.canDeleteWhere(fs.toArray))

  /** Route an analyzed UPDATE: conditions inside the v1 algebra (and
    * exactly row-evaluable) go to the native merge-on-read command;
    * anything else builds the scan-based plan HERE (so subqueries live in
    * a Filter node, which CheckAnalysis permits) and goes to
    * [[StrawUpdateScanCommand]]. */
  def rewriteUpdate(table: StrawboatTable,
      rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation,
      assignments: Seq[Assignment], condition: Option[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression, PlanExpression}
    val nativeFilters: Option[Seq[Filter]] = condition match {
      case None => Some(Seq(org.apache.spark.sql.sources.AlwaysTrue))
      case Some(c) => tryFilters(c).filter(fs =>
        RowFilterEval.build(rel.schema, fs.toArray).isDefined)
    }
    // the native path re-analyzes assignment RHS from rendered SQL over
    // the bare table schema — a SUBQUERY-valued assignment (SET v =
    // (SELECT max(x) FROM s)) cannot round-trip that way and routes to
    // the scan-based path, where Spark plans the whole projection
    val subqueryAssigned = assignments.exists(
      _.value.exists(_.isInstanceOf[PlanExpression[_]]))
    if (nativeFilters.isDefined && !subqueryAssigned)
      return StrawUpdateCommand(table.tablePath, table.pinnedVersion,
        assignments, condition)
    // scan-based: real (non-identity) assignments → post-assignment
    // projection over Filter(cond, relation+metadata)
    val real = assignments.filter {
      case Assignment(k: Attribute, v: Attribute) => k.name != v.name
      case _ => true
    }
    require(real.nonEmpty, "strawboat: UPDATE assigns every column to itself")
    val assignMap: Map[String, Expression] = real.map {
      case Assignment(k: Attribute, value) => k.name -> value
      case a => throw new UnsupportedOperationException(
        s"strawboat: UPDATE of a nested field is not supported: ${a.key.sql}")
    }.toMap
    val cond = condition.getOrElse(
      org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral)
    require(cond.deterministic,
      "strawboat: UPDATE condition must be deterministic")
    require(assignMap.values.forall(_.deterministic),
      "strawboat: UPDATE assignments must be deterministic")
    val dataCols: Seq[NamedExpression] = rel.output.map { a =>
      assignMap.get(a.name) match {
        case Some(v) => Alias(v, a.name)()
        case None => a
      }
    }
    StrawUpdateScanCommand(table.tablePath, table.pinnedVersion,
      StrawScanDml.planWithMeta(rel, cond, dataCols),
      assignMap.map { case (n, e) => n -> e.nullable })
  }

  /** Conjuncts → v1 filters; None when any conjunct refuses. The routing
    * rule runs at ANALYSIS time — before the optimizer's constant folding —
    * so analyzer-inserted literal casts (`id >= cast(5 as bigint)`) are
    * folded here first, exactly what the native paths see post-optimizer. */
  def tryFilters(cond: Expression): Option[Seq[Filter]] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Literal}
    def fold(e: Expression): Expression = e.transformUp {
      case x if x.foldable && !x.isInstanceOf[Literal] =>
        Literal.create(x.eval(), x.dataType)
    }
    val translated = conjuncts(fold(cond))
      .map(org.apache.spark.sql.graft.GraftSqlShims.translateFilter)
    if (translated.forall(_.isDefined)) Some(translated.map(_.get)) else None
  }

  /** Split a condition into v1 filters, refusing anything that does not
    * translate (no silent approximation). */
  def toFilters(cond: Expression, what: String): Seq[Filter] = {
    conjuncts(cond).map { c =>
      org.apache.spark.sql.graft.GraftSqlShims.translateFilter(c)
        .getOrElse(throw new UnsupportedOperationException(
          s"strawboat: $what condition does not translate to the source " +
            s"filter algebra: ${c.sql} (flat comparisons, IN, LIKE-prefix, " +
            "IS [NOT] NULL, AND/OR/NOT)"))
    }
  }

  def requireWritable(path: String, pinned: Option[Long]): Unit =
    require(pinned.isEmpty,
      s"strawboat: $path is pinned to version ${pinned.get} (time travel) — " +
        "historical snapshots are read-only")

  /** Strip analyzer-inserted implicit casts (an INT-typed VALUES source
    * against a BIGINT table) — the aligned source applies the target types
    * explicitly, so the cast carries no information here. */
  def uncast(e: Expression): Expression = e match {
    case c: org.apache.spark.sql.catalyst.expressions.Cast => uncast(c.child)
    case other => other
  }
}

/** Eager `UPDATE` execution: conditions inside the v1 filter algebra ride
  * [[StrawUpdate.updateExpressions]] (the native merge-on-read path, with
  * zone-map candidate pruning); anything beyond it — subqueries, complex
  * expressions — falls back to the scan-based [[StrawScanDml.update]],
  * where Spark itself evaluates the condition through the `_file`/`_pos`
  * metadata scan. */
case class StrawUpdateCommand(path: String, pinned: Option[Long],
    assignments: Seq[Assignment], condition: Option[Expression])
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    StrawDml.requireWritable(path, pinned)
    // the analyzer aligns assignments to EVERY table column (identity for
    // untouched ones) — keep only the real updates
    val real = assignments.filter {
      case Assignment(k: Attribute, v: Attribute) => k.name != v.name
      case _ => true
    }
    require(real.nonEmpty, "strawboat: UPDATE assigns every column to itself")
    val set = real.map {
      case Assignment(k: Attribute, value) =>
        // render the RHS unqualified (`upper(name)`, not `upper(cat.t.name)`)
        // — StrawUpdate re-analyzes it over the bare table schema
        k.name -> value.transform {
          case a: AttributeReference => a.withQualifier(Seq.empty)
        }.sql
      case a => throw new UnsupportedOperationException(
        s"strawboat: UPDATE of a nested field is not supported: ${a.key.sql}")
    }.toMap
    val filters = condition match {
      case Some(c) => StrawDml.toFilters(c, "UPDATE")
      case None => Seq(org.apache.spark.sql.sources.AlwaysTrue)
    }
    StrawUpdate.updateExpressions(spark, path, filters, set): Unit
    Seq.empty
  }
}

/** Eager scan-based `UPDATE` for conditions beyond the v1 filter algebra
  * ([[StrawScanDml.update]]): `scanPlan` holds the post-assignment
  * projection over `Filter(cond, relation+metadata)`, built at rewrite
  * time (so subqueries sit inside a Filter node — the location
  * CheckAnalysis permits). */
case class StrawUpdateScanCommand(path: String, pinned: Option[Long],
    scanPlan: LogicalPlan, assignedNullable: Map[String, Boolean])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(scanPlan)

  override def run(spark: SparkSession): Seq[Row] = {
    StrawDml.requireWritable(path, pinned)
    StrawScanDml.update(spark, path, scanPlan, assignedNullable): Unit
    Seq.empty
  }
}

/** Eager scan-based `DELETE` for conditions beyond the v1 filter algebra
  * ([[StrawScanDml.delete]]) — the translatable ones never reach here
  * (Spark's own SupportsDelete path handles them). `scanPlan` projects the
  * matched rows' `(_file, _pos)`. */
case class StrawDeleteScanCommand(path: String, pinned: Option[Long],
    scanPlan: LogicalPlan)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(scanPlan)

  override def run(spark: SparkSession): Seq[Row] = {
    StrawDml.requireWritable(path, pinned)
    StrawScanDml.delete(spark, path, scanPlan): Unit
    Seq.empty
  }
}

/** Eager `MERGE INTO` execution over [[StrawMerge.merge]]. */
case class StrawMergeCommand(path: String, pinned: Option[Long],
    relation: DataSourceV2Relation,
    source: LogicalPlan, targetOutput: Seq[Attribute], cond: Expression,
    matched: Seq[MergeAction], notMatched: Seq[MergeAction],
    notMatchedBySource: Seq[MergeAction])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    StrawDml.requireWritable(path, pinned)
    val targetSet = org.apache.spark.sql.catalyst.expressions.AttributeSet(targetOutput)

    // the analyzer expands `UPDATE SET *` / `INSERT *` into per-column
    // assignments from the source (possibly cast-wrapped when the source
    // is narrower) — the shape the FAST path recognizes
    def isStarAssignment(as: Seq[Assignment]): Boolean =
      as.forall { a =>
        (a.key, StrawDml.uncast(a.value)) match {
          case (k: Attribute, v: AttributeReference) =>
            !targetSet.contains(v) && k.name == v.name
          case _ => false
        }
      }

    // ---- FAST-path detection: [[StrawMerge]]'s key-pruned broadcast /
    // shuffle machinery handles the unconditional star shapes; anything
    // richer (conditional or partial clauses, renamed keys, exotic key
    // types) routes to the generalized scan-based path below. Detection
    // never throws — unsupported-for-fast just means "take the other road".
    val fastKeys: Option[Seq[String]] = {
      val pairs = StrawDml.conjuncts(cond).map {
        case EqualTo(l, r) => (StrawDml.uncast(l), StrawDml.uncast(r)) match {
          case (a: AttributeReference, b: AttributeReference) =>
            val (t, s) = if (targetSet.contains(a)) (a, b) else (b, a)
            if (targetSet.contains(t) && !targetSet.contains(s) &&
              t.name == s.name && StrawMerge.keyType(t.dataType)) Some(t.name)
            else None
          case _ => None
        }
        case _ => None
      }
      if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
    }
    val fastMatched: Option[StrawMerge.MatchedAction] = matched match {
      case Seq() => Some(StrawMerge.Keep)
      case Seq(UpdateAction(None, as, _)) if isStarAssignment(as) =>
        Some(StrawMerge.Replace)
      case Seq(DeleteAction(None)) => Some(StrawMerge.Delete)
      case _ => None
    }
    val fastNmbs: Option[Boolean] = notMatchedBySource match {
      case Seq() => Some(false)
      case Seq(DeleteAction(None)) => Some(true)
      case _ => None
    }
    // (insert?, source-only condition SQL) — a condition referencing the
    // target is not fast-expressible (the general path refuses it too)
    val fastInsert: Option[(Boolean, Option[String])] = notMatched match {
      case Seq() => Some((false, None))
      case Seq(InsertAction(None, as)) if isStarAssignment(as) =>
        Some((true, None))
      case Seq(InsertAction(Some(c), as)) if isStarAssignment(as) &&
          c.references.forall(a => !targetSet.contains(a)) &&
          // the fast path aligns the source to targetOutput's columns before
          // re-analyzing the condition, so a source-only column absent from
          // the target schema would be dropped — general path handles those
          c.references.forall(a => targetOutput.exists(_.name == a.name)) &&
          c.deterministic &&
          !c.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.PlanExpression[_]]) =>
        Some((true, Some(c.transform {
          case a: AttributeReference => a.withQualifier(Seq.empty)
        }.sql)))
      case _ => None
    }
    // SET * / INSERT * need every table column in the source
    val sourceCovers =
      targetOutput.map(_.name).forall(n =>
        source.output.exists(_.name == n))

    (fastKeys, fastMatched, fastNmbs, fastInsert) match {
      case (Some(keys), Some(whenMatched), Some(deleteNmbs),
          Some((insertNotMatched, insertCondition))) if sourceCovers =>
        // align the source to the TABLE's exact column types (the SQL-side
        // equivalent of the implicit casts the analyzer put in the
        // assignments) so an INT-typed VALUES source merges into a BIGINT
        // table directly
        val sourceDf = org.apache.spark.sql.graft.GraftSqlShims
          .dataFrame(spark, source)
          .select(targetOutput.map(a =>
            org.apache.spark.sql.functions.col(a.name).cast(a.dataType)
              .as(a.name)): _*)
        StrawMerge.merge(spark, path, sourceDf, keys, whenMatched,
          insertNotMatched,
          deleteNotMatchedBySource = deleteNmbs,
          insertCondition = insertCondition): Unit
      case _ =>
        StrawMergeScan.merge(spark, path, relation, source, targetOutput,
          cond, matched, notMatched, notMatchedBySource)
    }
    Seq.empty
  }
}
