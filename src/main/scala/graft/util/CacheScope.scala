package graft.util

import org.apache.spark.sql.Dataset

/** Caller-owned lifetime for the cached intermediates a lazy operator
  * plants (the Spark ML `handlePersistence` problem: an operator that
  * returns an unevaluated Dataset cannot know when its caches stop being
  * useful). The operator registers every `cache()` it takes into the
  * scope; the CALLER closes the scope after the consuming action — no
  * JVM-global registry, no cross-call mutable state, so concurrent
  * invocations can never unpersist each other's intermediates.
  *
  * The default argument at each operator entry point is a fresh,
  * never-closed scope: plain `cache()` semantics, with lifetime then
  * owned by the session harness (Bench/Verify call
  * `spark.catalog.clearCache()` between queries — the "unpersist after
  * the consuming action" option).
  */
final class CacheScope extends AutoCloseable {

  private val owned = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** Cache `ds` and register it for release at `close()`. */
  private[graft] def own[T](ds: Dataset[T]): Dataset[T] = synchronized {
    owned += ds
    ds.cache()
  }

  /** Release every registered cache (non-blocking). Idempotent. */
  override def close(): Unit = synchronized {
    owned.foreach(_.unpersist(false))
    owned.clear()
  }
}
