package graft

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry of every DataFrame this library has `persist()`ed inside an
  * operator (shared self-join branches, signature relations, decoded-media
  * tables). Operators must persist through [[persisted]] rather than calling
  * `.persist()` directly.
  *
  * Why it exists: several operators cache a branch that both sides of a
  * self-join read — correctness of the COST model, not of the result — but a
  * lazily-returned DataFrame gives the operator no "after the final action"
  * point at which to unpersist, so without a hook every invocation would leak
  * cached blocks for the session lifetime. Callers that run many operator
  * invocations in one session (benchmarks, services, notebooks) should call
  * [[unpersistAll]] once the results of a batch are materialized. Blocks are
  * spillable MEMORY_AND_DISK, so a missed call degrades (evicts) rather than
  * OOMs — but on a long-lived 100 TB-cluster session the hook is the
  * difference between bounded and unbounded executor storage.
  */
object CacheRegistry {
  private val frames = mutable.Buffer.empty[DataFrame]

  /** Persist `df` at `level` and remember the handle for [[unpersistAll]]. */
  def persisted(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      val p = df.persist(level)
      frames += p
      p
    }

  /** Unpersist every registered frame; returns how many were released.
    * Safe to call at any time — results already materialized are unaffected;
    * an un-materialized result simply recomputes its branch. */
  def unpersistAll(blocking: Boolean = false): Int = synchronized {
    val n = frames.size
    frames.foreach(_.unpersist(blocking))
    frames.clear()
    n
  }
}
