package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Direct release of `localCheckpoint()` blocks.
  *
  * A checkpointed Dataset exposes no unpersist, and the previous
  * workaround — diffing `sc.getPersistentRDDs` around the checkpoint
  * call — captures ANY RDD persisted concurrently in the snapshot
  * window (another thread's cache would be evicted on release). The
  * checkpointed blocks are reachable directly instead: a checkpointed
  * Dataset's logical plan IS a [[LogicalRDD]] wrapping the persisted
  * `RDD[InternalRow]`, so collect those and unpersist exactly them.
  * Iterative operators (connected components, PageRank) release their
  * edge checkpoints through this on every exit path — leaving them
  * pinned was the r7 session-residue finding. */
object Checkpoints {

  /** The RDDs a `df.localCheckpoint()` result holds pinned — the
    * `LogicalRDD` leaves of its analyzed plan (exactly one for a
    * checkpoint result; general plans may legitimately hold several,
    * e.g. a join of two checkpoints). */
  def pinnedRdds(df: DataFrame): Seq[RDD[_]] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }

  /** Unpersist (non-blocking) every checkpoint block `df` pins. */
  def release(df: DataFrame): Unit =
    pinnedRdds(df).foreach(_.unpersist(false))
}
