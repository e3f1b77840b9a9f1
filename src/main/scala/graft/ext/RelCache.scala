package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Persisted-relation cache shared by the [EXT] operators: repeated
  * calls (several dedup queries per run, several timed bench passes)
  * reuse ONE cached lineage instead of stacking a fresh MEMORY_AND_DISK
  * copy per call — the executor-memory discipline a long-lived 100 TB
  * session needs.
  *
  * Keys are `(session, tag)` with the SESSION OBJECT itself as the key
  * component (SparkSession uses identity equality): unlike an
  * identityHashCode int, references cannot collide between two live
  * sessions, so one session can never be handed a DataFrame bound to
  * another. Entries whose owning session has stopped are evicted on the
  * next lookup — their cached blocks died with the executors, so keeping
  * the entry would pin a dead plan (and the session object) forever. */
private[ext] object RelCache {
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  def cached(s: SparkSession, tag: String)(build: => DataFrame): DataFrame = {
    cache.filterInPlace { case ((owner, _), _) =>
      !owner.sparkContext.isStopped
    }
    cache.getOrElseUpdate((s, tag),
      build.persist(StorageLevel.MEMORY_AND_DISK))
  }
}
