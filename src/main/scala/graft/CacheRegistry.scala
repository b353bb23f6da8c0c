package graft

import org.apache.spark.sql.DataFrame

/** Lifecycle owner for operator-internal persisted DataFrames.
  *
  * Operators persist fan-out intermediates (shingle sets, banded
  * signature tables, simhash results) because broadcast-side joins have
  * no exchange to reuse — but a DataFrame returned to the caller cannot
  * unpersist its own inputs before the caller executes it. Every
  * operator registers its persists here; batch drivers that run many
  * queries in one session (Verify, Bench) call [[clearAll]] between
  * queries so cached blocks don't pile up for the whole run and rely on
  * LRU eviction under pressure. Sessions that skip cleanup only lose
  * memory-manager headroom — correctness never depends on this.
  */
object CacheRegistry {
  private val cached = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Record a persisted DataFrame for later bulk release. */
  def retain(df: DataFrame): DataFrame = synchronized { cached += df; df }

  /** [[retain]] + materialize the cache NOW with one count() pass.
    *
    * For multi-consumer persists (3+ downstream branches): AQE submits
    * independent leaf stages concurrently, and concurrent scans of a
    * not-yet-built InMemoryRelation serialize on per-block write locks
    * while holding task slots — with an expensive upstream (codec UDFs,
    * shingle extraction) the population effectively runs once per
    * racing stage. One eager count() builds every partition in a single
    * parallel pass so the fan-out only ever reads cached blocks. The
    * extra pass is over the already-computed cached data (cheap), and
    * at cluster scale it is the same idiom as Spark's own eager
    * broadcast materialization. Never changes results. */
  def eager(df: DataFrame): DataFrame = { retain(df); df.count(); df }

  /** Unpersist (non-blocking) everything retained since the last call. */
  def clearAll(): Unit = synchronized {
    cached.foreach(_.unpersist(false))
    cached.clear()
  }
}
