package graft

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame

/** Central registry for session-lifetime caches (persisted DataFrames
  * and fitted models), keyed by (family, key).
  *
  * Why it exists: several query families share one expensive
  * materialization (the demux/CDC parsed envelope, minhash candidate
  * pairs, the IVF quantizer). Memoizing them per (session, dir) is the
  * reference's single-pass shape — but an unbounded, never-released
  * cache is a memory leak in any long-lived service, and in the
  * driver's shared-session bench it inflated late queries up to 4×
  * (blocks pile up until GC-driven cleanup). Every memoized persist
  * therefore goes through this registry so a family can be released
  * as soon as its last consumer ran (`Bench` does this at each family
  * boundary; long-lived services would do the same per tenant/epoch).
  */
object Caches {

  private val entries = TrieMap.empty[(String, Any), Any]
  private val trackIds = new AtomicLong(0)

  /** Memoize an arbitrary value (e.g. a fitted model) under
    * (family, key).
    */
  def cached[T](family: String, key: Any)(build: => T): T =
    entries.getOrElseUpdate((family, key), build).asInstanceOf[T]

  /** Memoize + persist a DataFrame under (family, key). */
  def persisted(family: String, key: Any)(build: => DataFrame): DataFrame =
    cached(family, key)(build.persist())

  /** Persist a DataFrame created inside an operator (one per call,
    * no memoization) and register it so `release(family)` unpersists
    * it — operators must not leak session-lifetime cached blocks.
    */
  def track(family: String, df: DataFrame): DataFrame = {
    entries.put((family, ("track", trackIds.incrementAndGet())), df.persist())
    df
  }

  /** Register a release hook for cached state the registry cannot
    * unpersist itself (e.g. checkpoint RDD blocks behind a truncated
    * lineage) — `release(family)` invokes it exactly once.
    */
  def trackReleasable(family: String)(hook: () => Unit): Unit =
    entries.put((family, ("track", trackIds.incrementAndGet())), hook)

  /** Unpersist and drop everything registered under `family`. */
  def release(family: String): Unit =
    entries.keysIterator.filter(_._1 == family).foreach { k =>
      entries.remove(k).foreach {
        case df: DataFrame         => df.unpersist(blocking = false)
        case hook: (() => Unit) @unchecked => hook()
        case _                     => ()
      }
    }

  def releaseAll(): Unit =
    entries.keysIterator.map(_._1).toSet.foreach(release)
}
