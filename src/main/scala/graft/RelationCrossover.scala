package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Literal-vs-relation index crossover probe (round-14 item 1's
  * measurement half): times [[Similarity.ivfPqTopK]] with the index as
  * plan literals vs broadcast relations at growing index geometries,
  * so BASELINE.md can record WHERE the literal plan's analysis/codegen
  * cost overtakes the relation path's join overhead. Search cost is
  * config-dominated here (training replays per run on both paths —
  * identical work — so the delta isolates the plan-shape choice).
  *
  * Prints one JSON line per geometry:
  *   {"metric":"relation_crossover","num_cells":C,"codebook_k":K,
  *    "literal_sec":L,"relation_sec":R,...}
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_CELLS (comma list of numCells, default "8,32,64,128").
  */
object RelationCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val cells = sys.env.getOrElse("SPARK_GRAFT_CELLS", "8,32,64,128")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 3)
    def timeIt(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    for (nc <- cells) {
      // codebookK scales with the cell count so BOTH literal surfaces
      // (assignment argmax array + ADC table entries) grow together
      val ck = math.min(nc, 64)
      // median of 3 per path, interleaved so host drift hits both
      def run(rel: Boolean): Double = {
        val ts = (1 to 3).map(_ => timeIt {
          Similarity.ivfPqTopK(e, q, 5, nc, 1, 2, 4, ck, 1,
            indexAsRelation = rel).count()
        }).sorted
        ts(1)
      }
      val lit0 = run(rel = false)
      val rel0 = run(rel = true)
      println(s"""{"metric":"relation_crossover","num_cells":$nc,"codebook_k":$ck,"literal_sec":$lit0,"relation_sec":$rel0,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
