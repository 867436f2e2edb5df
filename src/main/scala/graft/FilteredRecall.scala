package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Similarity}

/** Filtered-ANN recall vs probe width (BASELINE.md round-14 second
  * wave): L161's scaladoc claims the standard selectivity/recall trade
  * — a selective allow-list thins every probed cell, so a fixed probe
  * budget returns fewer true neighbors and the caller widens `probes`.
  * This main MEASURES that claim instead of asserting it: recall@10 of
  * the store-served filtered top-k against brute-force cosine top-10
  * over the SAME allow-list (label = 3, ~10% selectivity), at probe
  * widths 1/2/4/8.
  *
  *   SPARK_GRAFT_SF_DIR  data directory (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_CPUS    local[N] (default 16)
  *
  * Prints one JSON line with recall per probe width.
  */
object FilteredRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val cells = Similarity.autoCells(n)
    val dir = "/tmp/graft_filtered_recall/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    IndexStore.buildIvfPq(e, dir, numCells = cells, cellIters = 2,
      numSub = 4, codebookK = math.min(cells, 64), pqIters = 2)
    val q = e.filter(col("vec_id") < 10)
    val allowed = e.filter(col("label") === 3).select(col("vec_id"))
    // ground truth: brute-force cosine top-10 over the allow-list only
    val truth = Similarity.bruteForceTopK(
        e.join(allowed, "vec_id"), q, k = 10)
      .select(col("qid"), col("nid"))
    val truthN = truth.count()
    val recalls = Seq(1, 2, 4, 8).map { probes =>
      val served = IndexStore.serveIvfPq(spark, dir, q, k = 10,
        probes = probes, allowed = Some(allowed))
        .select(col("qid"), col("nid"))
      val hit = served.join(truth, Seq("qid", "nid")).count()
      probes -> (if (truthN == 0) 0.0 else hit.toDouble / truthN)
    }
    // the two-stage answer: once probes cover the right cells, ADC
    // resolution is the remaining error (measured: recall saturates in
    // probes) — serve a WIDE filtered shortlist, exact-cosine refine
    // (q172's pattern), keep top-10. Since round 15 this IS the store
    // path (`refineWith` — the spec pins it ≡ the hand composition);
    // refine candidates are still allow-list members only, so the
    // refined set stays filtered.
    val refined = IndexStore.serveIvfPq(spark, dir, q, k = 10, probes = 4,
      allowed = Some(allowed), refineWith = Some(e), kShort = 50)
      .select(col("qid"), col("nid"))
    val refHit = refined.join(truth, Seq("qid", "nid")).count()
    val refRecall = if (truthN == 0) 0.0 else refHit.toDouble / truthN
    val body = recalls.map { case (p, r) => s""""probes_$p":$r""" }
      .mkString(",")
    println(s"""{"metric":"filtered_recall","n":$n,"cells":$cells,""" +
      s""""selectivity":"label=3","k":10,$body,""" +
      s""""refined_p4_k50":$refRecall,"sf":"$sfDir"}""")
    spark.stop()
  }
}
