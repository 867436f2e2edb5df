package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-step data generator for the BASELINE.md sf0.1→sf1 scaling
  * study: expands the driver's sf0.1 testdata by an integer `factor`
  * into a repo-local directory, PRESERVING the per-row statistical
  * profile so per-query work scales with the data and not with an
  * artifact of the expansion:
  *
  *   - `events`: replica k keeps every row but shifts event_id /
  *     user_id into disjoint ranges and ts by k×31 days — group counts
  *     (hourly buckets, users) grow ×factor while per-group density
  *     stays constant, exactly how a longer-running fleet would grow;
  *   - `lineitem`: replicas with disjoint l_orderkey ranges (only the
  *     Bench warm-up reads it here);
  *   - `documents`: the original docs are kept verbatim; new docs are
  *     SYNTHESIZED from the empirical unigram, length, lang and source
  *     distributions (deterministic per doc_id — java.util.Random's
  *     LCG is spec-fixed), with exact dups planted at 0.3% and
  *     near-dups (5% token mutation) at 5% — the observed q19 rate —
  *     each plant referencing one deterministic fresh target, so
  *     dup-pair counts scale LINEARLY with the corpus (no ×factor²
  *     dup-group blowup that exact replication would cause);
  *   - `embeddings`: originals kept; new vectors are fresh unit
  *     Gaussians (the measured profile: unit norms, pair cosines
  *     ~N(0, 0.125), labels uniform) — near-dup tail pairs keep their
  *     natural quadratic tail rate, which is the documented q22
  *     content profile, not a generator artifact.
  *
  * NOT part of the query surface — a measurement tool for the scale
  * validation the 100 TB design claims rest on. Never writes outside
  * the given output directory; never touches /root/testdata.
  */
object ScaleData {

  private def cumulative(pairs: Seq[(String, Long)]): (Array[String], Array[Long], Long) = {
    val items = pairs.map(_._1).toArray
    val cum = new Array[Long](pairs.size)
    var acc = 0L
    for (i <- pairs.indices) { acc += pairs(i)._2; cum(i) = acc }
    (items, cum, acc)
  }

  private def pick(items: Array[String], cum: Array[Long], total: Long,
      r: java.util.Random): String = {
    val x = (r.nextDouble() * total).toLong
    var lo = 0; var hi = cum.length - 1
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (cum(mid) <= x) lo = mid + 1 else hi = mid
    }
    items(lo)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    require(factor >= 2, "factor must be >= 2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- events + lineitem: disjoint-range replicas ----
    val ev = Tables.events(spark, srcDir)
    (0 until factor).map { k =>
      ev.select(
        (col("event_id") + lit(k.toLong * 1000000000L)).as("event_id"),
        (col("ts") + expr(s"INTERVAL ${k * 31} DAYS")).as("ts"),
        (col("user_id") + lit(k.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    (0 until factor).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 100000000L))
        .withColumn("l_partkey", col("l_partkey") + lit(k.toLong * 10000000L))
        .withColumn("l_suppkey", col("l_suppkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    // TPC-H dims/facts the reference-analytics queries join: orders
    // replicates alongside lineitem (same disjoint key ranges so the
    // join degree per order stays constant); customer/supplier/part
    // replicate with offset primary keys; nation/region are fixed
    // dimensions and copy through unchanged.
    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    (0 until factor).map { k =>
      orders
        .withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionAll _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    val cust = spark.read.parquet(s"$srcDir/customer.parquet")
    (0 until factor).map { k =>
      cust.withColumn("c_custkey", col("c_custkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionAll _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    val supp = spark.read.parquet(s"$srcDir/supplier.parquet")
    (0 until factor).map { k =>
      supp.withColumn("s_suppkey", col("s_suppkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionAll _)
      .repartition(4)
      .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    val part = spark.read.parquet(s"$srcDir/part.parquet")
    (0 until factor).map { k =>
      part.withColumn("p_partkey", col("p_partkey") + lit(k.toLong * 10000000L))
    }.reduce(_ unionAll _)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/part.parquet")
    spark.read.parquet(s"$srcDir/nation.parquet")
      .write.mode("overwrite").parquet(s"$outDir/nation.parquet")
    spark.read.parquet(s"$srcDir/region.parquet")
      .write.mode("overwrite").parquet(s"$outDir/region.parquet")

    // ---- documents: originals + profile-matched synthesis ----
    val docs = Tables.documents(spark, srcDir)
    val nDocs = docs.count()
    val vocabPairs = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy("t").as[(String, Long)].collect().toSeq
    val lengths = docs.select(size(split(col("text"), " ")))
      .as[Int].collect()
    val langPairs = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .orderBy("lang").as[(String, Long)].collect().toSeq
    val srcPairs = docs.groupBy("source").agg(count(lit(1)).as("c"))
      .orderBy("source").as[(String, Long)].collect().toSeq
    val (vocab, vocabCum, vocabTot) = cumulative(vocabPairs)
    val (langs, langCum, langTot) = cumulative(langPairs)
    val (srcs, srcCum, srcTot) = cumulative(srcPairs)
    val bcast = spark.sparkContext.broadcast(
      (vocab, vocabCum, vocabTot, lengths, langs, langCum, langTot,
        srcs, srcCum, srcTot))

    val newDocs = spark.range(nDocs, nDocs * factor).map { id =>
      val (vo, vc, vt, ls, la, lc, lt, so, sc, st) = bcast.value
      def freshTokens(docId: Long): Array[String] = {
        val r = new java.util.Random(docId * 2654435761L + 7)
        val n = ls(math.abs(r.nextInt(ls.length)))
        Array.fill(n)(pick(vo, vc, vt, r))
      }
      val rd = new java.util.Random(id * 40503L + 13)
      val roll = rd.nextDouble()
      // plant targets always regenerate FRESH text, so a chain of
      // plants still yields exactly one dup pair per planted doc
      val gap = 1 + rd.nextInt(500)
      val target = math.max(0L, id - gap)
      val toks =
        if (roll < 0.003 && id > nDocs) freshTokens(target)           // exact dup
        else if (roll < 0.053 && id > nDocs) {                        // near dup
          val base = freshTokens(target)
          val rm = new java.util.Random(id * 6364136223846793005L + 29)
          base.map(t => if (rm.nextDouble() < 0.05) pick(vo, vc, vt, rm) else t)
        } else freshTokens(id)
      val text = toks.mkString(" ")
      val rl = new java.util.Random(id * 104729L + 3)
      (id, text, pick(la, lc, lt, rl), pick(so, sc, st, rl), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.select("doc_id", "text", "lang", "source", "n_chars")
      .unionAll(newDocs)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    // ---- embeddings: originals + fresh unit Gaussians ----
    val emb = Tables.embeddings(spark, srcDir)
    val nEmb = emb.count()
    val dims = emb.select(size(col("embedding"))).as[Int].head()
    val newEmb = spark.range(nEmb, nEmb * factor).map { id =>
      val r = new java.util.Random(id * 9576890767L + 31)
      val v = Array.fill(dims)(r.nextGaussian())
      val nrm = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / nrm).toFloat).toSeq, r.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
    emb.select(col("vec_id"), col("embedding"),
        col("label").cast("int").as("label"))
      .unionAll(newEmb)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"""{"generated":"$outDir","factor":$factor,"docs":${nDocs * factor},"embeddings":${nEmb * factor}}""")
    spark.stop()
  }
}
