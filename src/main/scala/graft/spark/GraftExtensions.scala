package graft.spark

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ImageMetaFunctions, TextHashFunctions, VectorFunctions}

/** SQL access to table metadata that is otherwise a Scala API.
  *
  * `straw_history('path')` is a table-valued function over
  * [[StrawLog.history]] — the DESCRIBE-HISTORY audit as a relation:
  * {{{
  * SELECT version, operation, added_files FROM straw_history('/data/t')
  * ORDER BY version DESC
  * }}}
  * The history resolves at ANALYSIS time, so every query sees the current
  * commit log. Time travel in SQL needs no function: the reader options
  * work through a temporary view —
  * {{{
  * CREATE TEMPORARY VIEW t_v3 USING strawboat
  *   OPTIONS (path '/data/t', versionAsOf '3')
  * }}}
  * (`timestampAsOf` likewise).
  */
object StrawSqlSurface {
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  val HistoryName = "straw_history"

  private def historySchema: Seq[AttributeReference] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("timestamp", TimestampType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = false)(),
    AttributeReference("added_files", IntegerType, nullable = false)(),
    AttributeReference("removed_files", IntegerType, nullable = false)(),
    AttributeReference("dv_files", IntegerType, nullable = false)(),
    AttributeReference("txn_app", StringType, nullable = true)(),
    AttributeReference("txn_version", LongType, nullable = true)())

  /** Builds the relation for one `straw_history('<path>')` call. */
  def historyBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 && args.head.foldable &&
      args.head.dataType == StringType,
      s"$HistoryName expects one string literal: the table path")
    val path = args.head.eval(org.apache.spark.sql.catalyst.InternalRow.empty)
    require(path != null, s"$HistoryName: path must not be null")
    val rows = StrawLog.history(path.toString).map { h =>
      org.apache.spark.sql.catalyst.InternalRow(
        h.version,
        h.timestampMs * 1000L, // ms → µs
        UTF8String.fromString(h.operation),
        h.addedFiles,
        h.removedFiles,
        h.dvFiles,
        h.txn.map(t => UTF8String.fromString(t._1)).orNull,
        h.txn.map(t => Long.box(t._2)).orNull)
    }
    LocalRelation(historySchema, rows)
  }

  val RestoreName = "straw_restore"

  private def restoreSchema: Seq[AttributeReference] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("restored_to", LongType, nullable = false)(),
    AttributeReference("added_files", IntegerType, nullable = false)(),
    AttributeReference("removed_files", IntegerType, nullable = false)(),
    AttributeReference("dv_changes", IntegerType, nullable = false)())

  /** `straw_restore('<path>', <version>)`: performs the restore and returns
    * its metrics as one row (Delta's RESTORE TABLE shape). NOTE the restore
    * executes when the call RESOLVES — once per analyzed query, including
    * under EXPLAIN; re-running the restore is the no-op second row
    * (`version = -1`), so resolution-time execution cannot compound. */
  def restoreBuilder(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2 && args.forall(_.foldable) &&
      args.head.dataType == StringType &&
      Seq[org.apache.spark.sql.types.DataType](ByteType, ShortType,
        IntegerType, LongType).contains(args(1).dataType),
      s"$RestoreName expects (table path string, version integer) literals")
    val empty = org.apache.spark.sql.catalyst.InternalRow.empty
    val path = args.head.eval(empty)
    val v = args(1).eval(empty)
    require(path != null && v != null, s"$RestoreName: arguments must not be null")
    val r = StrawRestore.restore(path.toString,
      v.asInstanceOf[Number].longValue())
    LocalRelation(restoreSchema, Seq(org.apache.spark.sql.catalyst.InternalRow(
      r.version, r.restoredTo, r.addedFiles, r.removedFiles, r.dvChanges)))
  }

  /** Session-scoped registration (code-driven use; [[GraftExtensions]]
    * injects the same builders config-only). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(HistoryName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName, HistoryName),
      historyBuilder _)
    spark.sessionState.tableFunctionRegistry.registerFunction(
      FunctionIdentifier(RestoreName),
      new ExpressionInfo(classOf[StrawRestore.RestoreResult].getName, RestoreName),
      restoreBuilder _)
  }
}

/** Session-extensions entry point: injects every graft codegen'd function
  * (vector similarity/LSH/IVF kernels, text-hash kernels, media header
  * parsers) into the session at build time, so a cluster operator enables
  * the whole surface with CONFIG ONLY — no code:
  *
  * {{{
  * spark.sql.extensions=graft.spark.GraftExtensions
  * }}}
  *
  * or programmatically `SparkSession.builder().withExtensions(new
  * GraftExtensions)`. After that, plain SQL works everywhere the session
  * reaches (thriftserver, notebooks, `spark.sql(...)`):
  *
  * {{{
  * SELECT doc_id FROM docs WHERE cosine_similarity(emb, array(...)) > 0.9
  * SELECT simhash64(text) FROM docs
  * }}}
  *
  * The per-object `register(spark)` helpers remain for session-scoped,
  * code-driven use; both routes share the same function descriptions, so
  * the surfaces cannot drift apart. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    val all = VectorFunctions.descriptions ++
      TextHashFunctions.descriptions ++
      ImageMetaFunctions.descriptions
    all.foreach { case (name, clazz, builder) =>
      extensions.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder))
    }
    // table-valued metadata access (straw_history, straw_restore) rides
    // the same config
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.HistoryName),
      new ExpressionInfo(classOf[StrawLog.HistoryRow].getName,
        StrawSqlSurface.HistoryName),
      StrawSqlSurface.historyBuilder _))
    extensions.injectTableFunction((
      FunctionIdentifier(StrawSqlSurface.RestoreName),
      new ExpressionInfo(classOf[StrawRestore.RestoreResult].getName,
        StrawSqlSurface.RestoreName),
      StrawSqlSurface.restoreBuilder _))
  }
}
