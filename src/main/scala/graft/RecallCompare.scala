package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** ANN recall measurement main — prints one JSON line comparing
  * plain-PQ (q121 `ivfPqTopK`) against residual-PQ (q171
  * `ivfPqResidualTopK`) at IDENTICAL index config, scored as
  * recall@k vs the brute-force exact top-k (the q109 readout
  * semantics). A measurement tool like [[ScaleData]], not part of the
  * query surface; BASELINE.md records its outputs.
  *
  *   SPARK_GRAFT_SF_DIR  data directory (default /root/testdata/sf0.01)
  *   SPARK_GRAFT_CPUS    local[N] (default 16)
  */
object RecallCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val nQ = 10
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < nQ)
    val bf = Similarity.bruteForceTopK(e, q, k)
      .select(col("qid").as("__q"), col("nid").as("__n"))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hit = df.select(col("qid"), col("nid"))
        .join(bf, col("qid") === col("__q") && col("nid") === col("__n"))
        .count()
      hit.toDouble / (k.toLong * nQ)
    }
    val plain = recall(Similarity.ivfPqTopK(e, q, k,
      numCells = 8, cellIters = 2, probes = 2,
      numSub = 4, codebookK = 8, pqIters = 2))
    val resid = recall(Similarity.ivfPqResidualTopK(e, q, k,
      numCells = 8, cellIters = 2, probes = 2,
      numSub = 4, codebookK = 8, pqIters = 2))
    println(s"""{"metric":"pq_recall","k":$k,"n_queries":$nQ,"plain_pq":$plain,"residual_pq":$resid,"sf":"$sfDir"}""")
    // Maintenance before/after (round-14 item 6): recall of multiprobe
    // search on the merged corpus served by the STALE index (centroids
    // trained before the batch landed) vs the MAINTAINED set
    // ivfIndexMaintain selects. Same query/brute-force frame as above.
    val stale = Similarity.kmeansCentroidSeq(
      e.filter(!(col("vec_id") % 10 === 9)), 8, 2)
    val (_, maintained) = Similarity.ivfIndexMaintain(e, numCells = 8,
      iters = 2, deltaMod = 10, churnThreshold = 0.1)
    def searchWith(cent: Seq[(Long, Seq[Double])]): Double = {
      val v = e.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      val members = Similarity.assignCells(v, cent, probes = 1)
        .select(col("vec_id").as("nid"), col("v").as("nv"), col("cell"))
      val probed = Similarity.assignCells(
        q.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v")),
        cent, probes = 2)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("cell"))
      val scored = members.join(probed, Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          org.apache.spark.sql.functions.round(
            Similarity.dot(col("qv"), col("nv")) /
              (Similarity.l2norm(col("qv")) * Similarity.l2norm(col("nv"))),
            6).as("cos"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
      recall(scored.withColumn("rank",
        org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= k))
    }
    val staleR = searchWith(stale)
    val maintR = searchWith(maintained)
    println(s"""{"metric":"maintenance_recall","k":$k,"n_queries":$nQ,"stale_index":$staleR,"maintained_index":$maintR,"sf":"$sfDir"}""")
    spark.stop()
  }
}
