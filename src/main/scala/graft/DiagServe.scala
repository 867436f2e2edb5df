package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Similarity}

/** Scratch diagnostic for the round-15 serve-latency breakdown (not a
  * query surface): times each stage of a store serve separately so a
  * latency regression can be attributed — manifest resolution +
  * partition discovery, the code scan itself, the ADC serve over a
  * pre-resolved relation, and the full path.
  */
object DiagServe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata_sf1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
    val dir = "/tmp/graft_serve_bench/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    def timed(tag: String)(f: => Any): Unit = {
      // median of 5, warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-28s p50=${ts(2)}%6.3f  min=${ts.head}%6.3f  max=${ts.last}%6.3f")
    }
    timed("manifest+paths") { IndexStore.artifactPaths(spark, dir) }
    val art = IndexStore.artifactPaths(spark, dir)
    timed("codes listing+scan count") {
      spark.read.parquet(art("codes")).count()
    }
    timed("centroids read") { spark.read.parquet(art("centroids")).count() }
    timed("full serve (default)") {
      IndexStore.serveIvfPq(spark, dir, q, k = 10, probes = 2).count()
    }
    timed("full serve (static)") {
      IndexStore.serveIvfPq(spark, dir, q, k = 10, probes = 2,
        prune = true).count()
    }
    // pre-resolved: relations read once outside the timer
    val codes = spark.read.parquet(art("codes"))
      .select(col("vec_id"), col("sub"), col("code"),
        col("cell").cast("long").as("cell"))
    val cent = spark.read.parquet(art("centroids"))
    val books = spark.read.parquet(art("codebooks"))
    val meta = spark.read.parquet(art("meta")).head()
    val (numSub, w) = (meta.getAs[Int]("num_sub"), meta.getAs[Int]("w"))
    timed("adc serve, pre-resolved") {
      Similarity.ivfPqServe(codes, cent, books, q, 10, 2, numSub, w).count()
    }
    val codesCached = codes.cache(); codesCached.count()
    timed("adc serve, cached codes") {
      Similarity.ivfPqServe(codesCached, cent, books, q, 10, 2, numSub,
        w).count()
    }
    spark.stop()
  }
}
