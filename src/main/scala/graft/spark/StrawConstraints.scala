package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, BindReferences, Expression, PlanExpression, Predicate}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Table-level CHECK constraints, recorded in the transaction log and
  * enforced on every path that introduces NEW rows: batch append/overwrite,
  * streaming epochs, MERGE inserts, and UPDATE assignment outputs.
  * (Compaction, restore, and DELETE survivors only move rows that already
  * passed — they do not re-validate, so adding a constraint cannot strand
  * maintenance on historical data: [[add]] validates the whole table up
  * front instead.)
  *
  * Semantics are the strict (Delta-style) form: a row SATISFIES a
  * constraint only when the expression evaluates to TRUE — FALSE and NULL
  * both reject. (SQL's standard CHECK lets NULL pass; the strict form is
  * chosen so `CHECK (col IS NOT NULL)` and `CHECK (col > 0)` both mean
  * what a data-quality gate wants with no three-valued-logic surprises.
  * Spell `CHECK (col IS NULL OR col > 0)` for the lenient reading.)
  *
  * Expressions are ANSI SQL scalars over the table's columns, analyzed by
  * the session (function registry, session timezone) and bound once per
  * write job; deterministic only, no aggregates, no subqueries. Foldable
  * subtrees (including `current_timestamp()`) fold once at bind time, so a
  * time-dependent constraint is evaluated against the WRITE's statement
  * time. Enforcement is a codegen'd Catalyst predicate per task — no extra
  * pass over the data, no shuffle; a violation fails the write job before
  * any file becomes visible (staged files are swept, the log never moves).
  *
  * Concurrency: [[add]] validates existing rows and then commits the
  * constraint as a log action; an append racing the add window can slip
  * unvalidated rows in (the same window Delta documents). Same-name
  * add/drop races are detected by the log commit (name-keyed) and fail
  * with [[StrawLog.ConflictException]].
  */
object StrawConstraints {

  /** A row failed a CHECK constraint (or [[add]] found existing rows that
    * would). The write/commit that raised it changed nothing visible. */
  final class ConstraintViolationException(msg: String)
    extends RuntimeException(msg)

  /** One live constraint bound to a concrete write schema. */
  final case class Constraint(name: String, sql: String, bound: Expression)

  /** Serializable per-task enforcer: evaluates every constraint against
    * each row via codegen'd predicates (interpreted fallback), throwing
    * [[ConstraintViolationException]] on the first rejection. `schema` is
    * carried only to render the offending row in the error. */
  final class RowChecker(val checks: Array[Constraint], schema: StructType)
    extends Serializable {
    @transient private lazy val preds = checks.map { c =>
      val p = Predicate.create(c.bound)
      p.initialize(0)
      p
    }
    def validate(row: InternalRow): Unit = {
      var i = 0
      while (i < checks.length) {
        if (!preds(i).eval(row)) {
          val c = checks(i)
          throw new ConstraintViolationException(
            s"strawboat: CHECK constraint '${c.name}' (${c.sql}) violated by " +
              s"row ${render(row)}")
        }
        i += 1
      }
    }
    private def render(row: InternalRow): String =
      try schema.fields.take(8).zipWithIndex.map { case (f, i) =>
        val v = if (row.isNullAt(i)) "null" else row.get(i, f.dataType)
        s"${f.name}=$v"
      }.mkString("(", ", ", if (schema.length > 8) ", …)" else ")")
      catch { case scala.util.control.NonFatal(_) => "(unrenderable)" }
  }

  /** The live constraints of a table (empty when none, or no log yet). */
  def list(dir: String): Map[String, String] =
    StrawLog.snapshot(dir).map(_.constraints).getOrElse(Map.empty)

  /** Add a named CHECK constraint: validates every EXISTING row (strict
    * semantics — a row whose expression is not TRUE fails the add), then
    * commits the constraint to the log so every later new-data write
    * enforces it. Idempotent for an identical (name, expression) pair.
    * On a table with no data files yet, validation is vacuous and the
    * commit bootstraps the log. @return the committed log version */
  def add(spark: SparkSession, dir: String, name: String, expr: String): Long = {
    require(name.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"),
      s"strawboat: constraint name '$name' must match [A-Za-z0-9_][A-Za-z0-9_.-]*")
    val existing = list(dir)
    existing.get(name).foreach { cur =>
      if (cur == expr) return StrawLog.snapshot(dir).map(_.version).getOrElse(1L)
      throw new IllegalArgumentException(
        s"strawboat: constraint '$name' already exists on $dir with a " +
          s"different expression ($cur); drop it first")
    }
    val hasData = StrawIO.listFiles(dir).nonEmpty
    if (hasData) {
      val df = spark.read.format("strawboat").load(dir)
      // bind first: a malformed/ill-typed expression must fail with the
      // bind error, not a confusing scan failure
      bindOne(spark, df.schema, name, expr)
      import org.apache.spark.sql.functions.{expr => sqlExpr, lit, not}
      val bad = df.filter(not(sqlExpr(expr) <=> lit(true))).count()
      if (bad > 0) throw new ConstraintViolationException(
        s"strawboat: cannot add CHECK constraint '$name' ($expr) to $dir — " +
          s"$bad existing row(s) violate it")
    }
    StrawLog.commit(dir, Seq.empty, op = s"add constraint $name",
      constraintOps = Seq(name -> Some(expr)))
  }

  /** Drop a named constraint. @return the committed log version */
  def drop(dir: String, name: String): Long = {
    require(list(dir).contains(name),
      s"strawboat: constraint '$name' does not exist on $dir " +
        s"(live: ${list(dir).keys.toSeq.sorted.mkString(", ")})")
    StrawLog.commit(dir, Seq.empty, op = s"drop constraint $name",
      constraintOps = Seq(name -> None))
  }

  /** The enforcer for a write of `writeSchema`-shaped rows into `dir` —
    * None when the table has no constraints (the hot path stays a null
    * check). Binding happens on the driver once per write job; a
    * constraint whose columns the write schema lacks fails here, before
    * any task runs. */
  def checkerFor(spark: SparkSession, dir: String,
      writeSchema: StructType): Option[RowChecker] = {
    val live = list(dir)
    if (live.isEmpty) None
    else Some(new RowChecker(
      live.toSeq.sortBy(_._1).map { case (n, e) =>
        Constraint(n, e, bindOne(spark, writeSchema, n, e))
      }.toArray, writeSchema))
  }

  /** Analyze + bind one constraint expression against a write schema:
    * session-analyzed (functions, timezone), boolean-typed, deterministic,
    * subquery-free, foldables folded once (statement-scoped), attributes
    * bound to row ordinals, nothing unevaluable left. */
  private[spark] def bindOne(spark: SparkSession, schema: StructType,
      name: String, exprStr: String): Expression = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val analyzed =
      try empty.select(org.apache.spark.sql.functions.expr(exprStr))
        .queryExecution.analyzed
      catch {
        case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
          s"strawboat: constraint '$name' does not analyze over " +
            s"${schema.catalogString}: $exprStr", e)
      }
    val (resolved, childOutput) = analyzed match {
      case p: Project =>
        (p.projectList.head match {
          case a: Alias => a.child
          case e => e
        }, p.child.output)
      case other => throw new IllegalArgumentException(
        s"strawboat: constraint '$name' is not a scalar row expression " +
          s"(${other.nodeName}): $exprStr")
    }
    require(resolved.dataType == BooleanType,
      s"strawboat: constraint '$name' must be BOOLEAN, got " +
        s"${resolved.dataType.simpleString}: $exprStr")
    require(resolved.deterministic,
      s"strawboat: constraint '$name' must be deterministic: $exprStr")
    require(!resolved.exists(_.isInstanceOf[PlanExpression[_]]),
      s"strawboat: constraint '$name' must not contain a subquery: $exprStr")
    val bound = BindReferences.bindReference(foldOnce(resolved), childOutput)
    require(!bound.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Unevaluable]),
      s"strawboat: constraint '$name' contains an expression only the " +
        s"optimizer can evaluate: $exprStr")
    bound
  }

  /** Driver-side ConstantFolding (see [[StrawUpdate]]'s twin): per-row eval
    * of a time-dependent foldable would drift across rows/retries — pin it
    * to one bind-time value. */
  private def foldOnce(e: Expression): Expression =
    if (e.foldable)
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(e.eval(org.apache.spark.sql.catalyst.expressions.EmptyRow), e.dataType)
    else e.mapChildren(foldOnce)
}
