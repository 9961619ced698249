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
  def local[T](ds: Dataset[T]): Dataset[T] =
    ds.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

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
