package graft.operators

import org.apache.spark.sql.DataFrame

/** Execution-shape helpers for ITERATIVE operators (CC rounds, PageRank
  * steps, greedy selection rounds). They change where a plan is rooted,
  * never a value: every row that flows through them is bit-identical.
  *
  * Why they exist (round-18 optimization measurement): chained
  * iteration frames re-enter Catalyst on EVERY downstream action — the
  * logical tree grows with each round (and doubles per round when a
  * frame is referenced twice, as PageRank's contrib+dangling did), so
  * analysis/AQE re-optimization comes to dominate wall time. q191
  * measured 67 s isolated at sf0.1 with all 32 executor threads IDLE
  * and the driver thread inside Catalyst/AQE rules (the guide §7.3
  * thread-dump diagnosis); the data itself is kilobytes. Persisting the
  * frames (which these operators always did) caps EXECUTION, but not
  * re-ANALYSIS — the optimizer still walks the full logical history
  * before the cache lookup replaces subtrees.
  */
object Exec {

  /** Re-root `df` at its compiled RDD: same rows, same schema, but the
    * logical plan downstream actions see is a single leaf. When `df` is
    * persisted, executing the re-rooted frame computes through (and
    * populates) that cache exactly as the original would. Use inside an
    * iteration loop, after each round's frame is persisted, so round
    * R's plan is O(1) nodes instead of O(R) — the documented fix for
    * the q183/q191 driver-bound profile. The row round-trip converts
    * container types only (long/double/array), never arithmetic.
    */
  def rebind(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  // JVM-scoped temp roots for materialized intermediates; deleted on
  // exit so a long bench session cannot leak them into the next run
  private val tmpRoots = new java.util.concurrent.ConcurrentLinkedQueue[java.io.File]
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tmpRoots.forEach(root => deleteRec(root))
    }, "graft-exec-tmp-cleanup"))
  }
  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec)
    f.delete(); ()
  }

  /** Materialize `df` once to a JVM-temp parquet and return a plan
    * that READS IT BACK — the guide §3.3 discipline ("materialising an
    * intermediate result truncates the plan"). For loops whose RESULT
    * is returned to a caller: the previous stateless-replay pattern
    * re-executed the entire upstream (LSH/blocked pair generation
    * included) a second time when the caller materialized the result,
    * because the loop's own persisted frames must be released before
    * return (the shared-session no-cached-RDDs contract). The write is
    * intra-invocation — a fresh directory per call, recomputed from
    * the inputs on every invocation, removed at JVM exit — so no state
    * survives across runs.
    */
  def materializeToTemp(df: DataFrame, tag: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag-").toFile
    tmpRoots.add(dir)
    df.write.mode("overwrite").parquet(dir.getAbsolutePath)
    df.sparkSession.read.parquet(dir.getAbsolutePath)
  }
}
