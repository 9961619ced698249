package graft.functions

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** House localCheckpoint: eager + MEMORY_AND_DISK_SER.
  *
  * The default localCheckpoint() stores DESERIALIZED rows
  * (MEMORY_AND_DISK): a shingle/bigram posting table that is 1–2 GB
  * as parquet inflates several-fold on-heap, and at 100× SF the block
  * build itself OOMs a modestly-sized executor before spill can help
  * (observed: the whole pair family dying in stage 9 at sf10 on the
  * 8 g local JVM). Serialized storage keeps blocks compact (UnsafeRow
  * bytes), spills cleanly, and costs one deserialization on re-read —
  * the right trade for every materialize-once table in this engine.
  * Small frames lose nothing. On a real cluster the same reasoning
  * holds per executor.
  */
object Cp {

  /** Checkpoint-transparency registry for the plan-invariant tests.
    *
    * Eager checkpoints TRUNCATE lineage: anything materialized via
    * [[local]] disappears from the final sparkPlan, so invariants
    * scanned there (global-window funnels, merge-join/no-broadcast
    * assertions) cannot see inside a materialized subtree — and the
    * engine materializes its most scale-sensitive subtrees (pair
    * pipelines, posting tables, histogram spines) exactly there.
    * While recording is on, [[local]] captures each input's physical
    * plan BEFORE truncation; PlanShapeSpec asserts invariants over
    * the union of the final plan and every recorded subtree, so a
    * data-sized global window hidden under a checkpoint fails the
    * test instead of slipping through (the round-10 q_dsir lesson). */
  private val recorded =
    new scala.collection.mutable.ArrayBuffer[
      org.apache.spark.sql.execution.SparkPlan]()
  @volatile private var recording = false

  def startRecording(): Unit = synchronized {
    recorded.clear(); recording = true
  }

  def stopRecording(): Seq[org.apache.spark.sql.execution.SparkPlan] =
    synchronized {
      recording = false
      val out = recorded.toList
      recorded.clear()
      out
    }

  def local[T](ds: Dataset[T]): Dataset[T] = {
    if (recording) synchronized {
      if (recording) recorded += ds.queryExecution.sparkPlan
    }
    ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
  }

  /** Iterative-round checkpoint hygiene: drop a DEAD generation's
    * localCheckpoint blocks by RDD id. Eager localCheckpoints truncate
    * lineage, so dropped blocks are unrecoverable — callers must only
    * pass ids no live plan references. Without this an N-round loop
    * pins N generations of checkpointed state until the ContextCleaner
    * GCs them — which at 100× SF is after the OOM, not before. */
  def dropGeneration(s: org.apache.spark.sql.SparkSession,
                     ids: scala.collection.Set[Int]): Unit =
    s.sparkContext.getPersistentRDDs
      .filter { case (id, _) => ids(id) }
      .values.foreach(_.unpersist(blocking = false))
}
