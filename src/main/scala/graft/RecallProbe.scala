package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall measurement for the gated q62→q78 swap (L29/L43): the IVF
  * 1-NN graph (`Similarity.ivfKnnGraph`) vs the exact scan, at probe
  * counts 2/4/8 over 8 cells. `probes = numCells` probes every cell,
  * which makes the candidate set the full corpus — identical (same
  * 6-dp rounding, same nid tie-break) to q62's exact N² neighbor
  * choice — so the p=8 graph IS the exact baseline and the probe
  * sweep isolates what partial probing loses. Numbers are recorded in
  * BASELINE.md ("q78 recall"); re-run with
  * `runMain graft.RecallProbe [sfDir]`.
  */
object RecallProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-recall-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val emb = Tables.embeddings(spark, sfDir).cache()
      val n = emb.count()
      val numCells = 8
      def top1(probes: Int): Map[Long, Long] =
        graft.operators.Similarity
          .ivfKnnGraph(emb, k = 1, numCells = numCells, iters = 2, probes = probes)
          .filter(col("rank") === 1)
          .select(col("qid"), col("nid"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = top1(numCells) // all cells probed = the exact scan
      println(s"""{"sf_dir":"$sfDir","n_vectors":$n,"num_cells":$numCells,""" +
        Seq(2, 4, 8).map { p =>
          val approx = top1(p)
          val hit = exact.count { case (q, nid) => approx.get(q).contains(nid) }
          s""""recall_at_1_probes_$p":${"%.4f".format(hit.toDouble / exact.size)}"""
        }.mkString(",") + "}")
    } finally spark.stop()
  }
}
