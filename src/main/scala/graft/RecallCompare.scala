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
    spark.stop()
  }
}
