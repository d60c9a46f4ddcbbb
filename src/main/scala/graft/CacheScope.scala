package graft

import org.apache.spark.sql.DataFrame

/** Ownership for the `persist()` handles pairwise operators create.
  *
  * Operators with self-joins (MinHash banding, Jaccard shingling, SRP
  * near-dup, IVF assignment) must materialize intermediates so both join
  * sides read them instead of recomputing the signature chain. Someone has
  * to own those caches:
  *
  *  - [[CacheScope.Global]] (the default) leaves them to the session —
  *    appropriate for one-shot jobs, where `spark.catalog.clearCache()` or
  *    session teardown reclaims everything.
  *  - [[CacheScope.scoped]] records every frame persisted through it;
  *    `close()` unpersists them all. A long-lived application calling the
  *    operators per batch wraps each batch in a scope so executor storage
  *    memory cannot accumulate across batches (and closing one scope never
  *    evicts another batch's — or another team's — caches the way the
  *    global `clearCache()` hammer does).
  *
  * Close the scope only after the returned plan has been fully consumed:
  * the frames back the operator's output lineage, and unpersisting earlier
  * silently degrades to recomputation.
  */
sealed trait CacheScope {
  /** Persist `df` under this scope's lifetime and return it. */
  def persist(df: DataFrame): DataFrame
  /** Release every frame persisted through this scope (no-op for Global). */
  def close(): Unit
}

object CacheScope {

  /** Session-lifetime caches: nothing is tracked, nothing auto-released. */
  object Global extends CacheScope {
    override def persist(df: DataFrame): DataFrame = df.persist()
    override def close(): Unit = ()
  }

  /** A scope that owns its caches; thread-safe, idempotent `close()`. */
  final class Scoped private[CacheScope] () extends CacheScope {
    private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    override def persist(df: DataFrame): DataFrame = synchronized {
      val p = df.persist(); frames += p; p
    }
    override def close(): Unit = synchronized {
      frames.foreach(_.unpersist(blocking = false)); frames.clear()
    }
  }

  def scoped(): Scoped = new Scoped

  /** Run `body` with a fresh scope, closing it afterwards. Only sound when
    * `body` fully consumes (collects/writes/counts) what it computes. */
  def withScope[A](body: CacheScope => A): A = {
    val s = scoped()
    try body(s) finally s.close()
  }
}
