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
  *
  * SCOPE — process-global, by design and with consequences to know about:
  *
  *   - [[unpersistAll]] releases EVERY registered branch in the JVM, not
  *     just the calling thread's. If another thread is mid-query on an
  *     operator whose persisted branch is dropped, its result stays CORRECT
  *     (Spark recomputes the branch) but the cost model silently reverts to
  *     recompute — call the hook at batch boundaries, not concurrently with
  *     in-flight queries. A per-operator handle can't fix this cleanly: the
  *     returned DataFrame is lazy, so no operator-local point exists at
  *     which releasing is safe; the batch boundary is genuinely the
  *     caller's knowledge.
  *   - The driver-side handle list grows until the hook runs. Handles are
  *     small (the heavy state — cached blocks — is Spark's, and evictable),
  *     and [[persisted]] prunes handles that some other path already
  *     unpersisted, so the list is bounded by the live-cache count in any
  *     session that calls the hook at all. A library user who NEVER calls
  *     [[unpersistAll]] keeps one small object per operator invocation —
  *     monitor with [[registeredCount]] if that matters.
  */
object CacheRegistry {
  private val frames = mutable.Buffer.empty[DataFrame]

  /** Persist `df` at `level` and remember the handle for [[unpersistAll]].
    * Also drops handles whose cache is already gone (unpersisted by Spark
    * or an earlier hook) so the registry tracks live caches only. */
  def persisted(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    synchronized {
      val live = frames.filter(_.storageLevel != StorageLevel.NONE)
      frames.clear()
      frames ++= live
      val p = df.persist(level)
      frames += p
      p
    }

  /** How many persisted branches the registry currently tracks. */
  def registeredCount: Int = synchronized(frames.size)

  /** Unpersist every registered frame; returns how many were released.
    * Safe to call at any time — results already materialized are unaffected;
    * an un-materialized result simply recomputes its branch. Process-global:
    * see the scope note on [[CacheRegistry]]. */
  def unpersistAll(blocking: Boolean = false): Int = synchronized {
    val n = frames.size
    frames.foreach(_.unpersist(blocking))
    frames.clear()
    n
  }
}
