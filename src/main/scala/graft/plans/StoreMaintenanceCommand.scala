package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.types.{LongType, StringType}

/** DEFERRED-EXECUTION carrier for the SQL store-maintenance verbs
  * (append_store / compact_store TVFs).
  *
  * Why a RunnableCommand and not an eager builder (the dup_clusters
  * TVF class): the maintenance verbs APPEND to an existing catalog
  * table, and running that inside the TVF builder DEADLOCKS — the
  * builder executes while the analyzer holds the SessionCatalog
  * monitor (SessionCatalog.resolveBuiltinOrTempFunctionInternal is
  * synchronized), and under AQE the insert's result stage runs on a
  * SEPARATE thread that finishes with CommandUtils.updateTableStats →
  * catalog.refreshTable — synchronized on the same monitor (observed
  * live: builder parked in AdaptiveSparkPlanExec.withFinalPlanUpdate,
  * ResultQueryStageExecution blocked on the catalog). The ensure/CTAS
  * path escapes only because a not-yet-cataloged table skips the
  * stats refresh — which is why the admission TVFs' eager ensure is
  * fine but an eager append is not. A RunnableCommand defers `body`
  * to ExecutedCommandExec / eager command execution, AFTER analysis
  * has released the monitor, so the inner job's stage threads can
  * take it freely. */
case class StoreMaintenanceCommand(
    verb: String, family: String,
    body: SparkSession => Seq[Row])
  extends org.apache.spark.sql.execution.command.LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("family", StringType, nullable = false)(),
    AttributeReference("store_table", StringType, nullable = false)(),
    AttributeReference("store_rows", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = body(session)
}
