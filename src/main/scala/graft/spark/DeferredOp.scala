package graft.spark

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan}

/** A table-valued maintenance operation (VACUUM, OPTIMIZE-style compaction,
  * RESTORE, constraint DDL) deferred to EXECUTION time.
  *
  * The `straw_*` table functions resolve through Spark's table-function
  * registry, whose builders run during ANALYSIS — which is also when
  * `EXPLAIN`, view re-analysis, and cached-plan re-resolution run. A builder
  * that performs its side effect inline therefore vacuums/compacts/restores
  * under `EXPLAIN SELECT * FROM straw_vacuum_log('t')`, which is a footgun
  * even when each individual operation is idempotent (re-analysis after new
  * commits advances a vacuum horizon, irreversibly).
  *
  * This node splits the lifecycle the way Spark's own commands do:
  * argument VALIDATION stays in the builder (malformed calls still fail at
  * analysis with the function's error message), while the side effect moves
  * into [[DeferredOpExec.doExecute]] — driver-side, because the thunks
  * launch their own Spark jobs (compaction is a distributed rewrite) and
  * mutate driver-held log caches. `EXPLAIN` formats the plan without ever
  * calling `doExecute`, so it provably changes nothing on disk; each ACTION
  * on the query re-runs the thunk (functions needing one-shot semantics —
  * restore, compact — keep their own process-wide replay guards inside the
  * thunk, unchanged).
  *
  * The result rows are tiny (operation metrics), so the one-partition RDD
  * costs one no-op task. */
case class DeferredOpPlan(
    fn: String,
    override val output: Seq[Attribute],
    run: () => Seq[InternalRow]) extends LeafNode {
  // metrics rows: one or a handful — always broadcast-small
  override def computeStats(): Statistics = Statistics(sizeInBytes = 256)
  override def simpleString(maxFields: Int): String = s"DeferredOp $fn"
}

case class DeferredOpExec(
    fn: String,
    override val output: Seq[Attribute],
    run: () => Seq[InternalRow]) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] = {
    // driver-side: the thunk may launch jobs (compaction/constraint scans)
    // and must see/refresh the driver's log snapshot caches
    val proj = UnsafeProjection.create(output, output)
    val rows = run().map(r => proj(r).copy())
    sparkContext.parallelize(rows, 1)
  }
  override def simpleString(maxFields: Int): String = s"DeferredOpExec $fn"
}

object DeferredOpStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredOpPlan(fn, out, run) => DeferredOpExec(fn, out, run) :: Nil
    case _ => Nil
  }
}
