package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the q81 32-core pathology. NOT part of the
  * engine; deleted before commit.
  */
object Diag81 {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[diag] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    time("docs count")(println(docs.count()))

    // piecewise replication of tfIdfCosineJoin
    import org.apache.spark.sql.graft.Signatures
    val toks = docs.select(col("doc_id"), explode(
      graft.operators.TextOps.tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 10000)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val weighted = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("w"))
    val vecs = weighted.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("term"), col("w")))).as("vec"))
      .select(col("doc_id"),
        transform(col("vec"), e => e.getField("term")).as("terms"),
        transform(col("vec"), e => e.getField("w")).as("ws"),
        sqrt(aggregate(col("vec"), lit(0.0),
          (a, x) => a + x.getField("w") * x.getField("w"))).as("nrm"))
      .filter(col("nrm") > 0)
      .cache()
    time("vecs materialize")(println(vecs.count()))
    val b = 16
    val blocked = vecs.withColumn("blk",
      pmod(xxhash64(col("doc_id")), lit(b.toLong)).cast("int"))
    val left = blocked.select(col("doc_id").as("i"), col("terms").as("ta"),
        col("ws").as("wa"), col("nrm").as("ni"), col("blk").as("bi"))
      .withColumn("cell", explode(transform(
        sequence(col("bi"), lit(b - 1)), x => col("bi") * b + x)))
    val right = blocked.select(col("doc_id").as("j"), col("terms").as("tb"),
        col("ws").as("wb"), col("nrm").as("nj"), col("blk").as("bj"))
      .withColumn("cell", explode(transform(
        sequence(lit(0), col("bj")), y => y * b + col("bj"))))
    val joined = left.join(right, left("cell") === right("cell") &&
        (col("bi") =!= col("bj") || col("i") < col("j")))
      .select(
        least(col("i"), col("j")).as("i"),
        greatest(col("i"), col("j")).as("j"),
        round(Signatures.sparse_dot(col("ta"), col("wa"), col("tb"), col("wb"))
          / (col("ni") * col("nj")), 6).as("cos"))
      .filter(col("cos") >= 0.2)
    def mk(r: org.apache.spark.sql.DataFrame) =
      left.join(r, left("cell") === r("cell") &&
          (col("bi") =!= col("bj") || col("i") < col("j")))
        .select(
          least(col("i"), col("j")).as("i"),
          greatest(col("i"), col("j")).as("j"),
          round(Signatures.sparse_dot(col("ta"), col("wa"), col("tb"), col("wb"))
            / (col("ni") * col("nj")), 6).as("cos"))
        .filter(col("cos") >= 0.2)
    val shj = mk(right.hint("shuffle_hash"))
    time("SHJ 1")(println(shj.count()))
    time("SHJ 2")(println(shj.count()))
    time("SHJ 3")(println(shj.count()))
    val smj = mk(right.hint("merge"))
    time("SMJ 1")(println(smj.count()))
    time("SMJ 2")(println(smj.count()))
    time("SMJ 3")(println(smj.count()))
    spark.stop()
  }
}
