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
    val (srcDir, outDir, factor, profile) = args match {
      case Array(s, o, f)    => (s, o, f.toInt, "uniform")
      case Array(s, o, f, p) => (s, o, f.toInt, p)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, factor, profile)
    spark.stop()
  }

  /** The generator body, session-borrowing (specs call this against
    * the shared test session — main() owns session lifecycle, this
    * never stops or configures one).
    */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      factor: Int, profile: String): Unit = {
    require(factor >= 2, "factor must be >= 2")
    require(profile == "uniform" || profile == "skew",
      s"profile must be uniform|skew, got $profile")
    val skew = profile == "skew"
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

    val totalDocs = nDocs * factor
    // ---- skew profile (the 100 TB hostile-data story): three planted
    // pathologies real crawls exhibit and uniform synthesis cannot —
    //   hot source : 90% of synthesized docs land on ONE source (the
    //                q68 quota / q104 shard / q146 per-source-set
    //                stressor);
    //   hot shingle: a fixed 8-token boilerplate phrase injected into
    //                30% of fresh docs — one corpus-hot posting/bucket
    //                for the q19/q53/q97 maxBucket/maxPosting caps to
    //                earn their keep on (an 8-token run stays under
    //                the minShared pair thresholds, so TRUE pair
    //                counts don't explode — only the postings do);
    //   dup slab   : the last 2% of ids are exact dups drawn from a
    //                64-doc target pool — dup GROUPS of ~thousands,
    //                the connected-components / canonical-select
    //                straggler shape.
    // Exact-dup/near-dup plants target only ids whose own text is
    // FRESH (re-deriving the target's roll), so realized dup rates
    // match the advertised 0.3%/5% instead of silently sagging where
    // plants would chain or cross the original-corpus boundary.
    val hotPhrase = Array("please", "accept", "all", "cookies", "to",
      "continue", "reading", "this")
    val hotSource = srcPairs.maxBy(_._2)._1
    val slabSize = if (skew) math.max(64L, totalDocs / 50) else 0L
    val slabStart = totalDocs - slabSize
    // slab targets: the first 64 ids at/above nDocs whose roll is
    // fresh (driver-side walk, 64 Random draws — trivially bounded)
    def rollsFresh(t: Long): Boolean =
      t == nDocs || new java.util.Random(t * 40503L + 13).nextDouble() >= 0.053
    val slabPool: Array[Long] =
      if (!skew) Array.empty
      else {
        // bounded scan: only ids in [nDocs, slabStart) can qualify, so
        // a too-small corpus fails fast instead of spinning forever
        val pool = (nDocs until slabStart).iterator
          .filter(rollsFresh).take(64).toArray
        require(pool.length == 64,
          s"skew profile needs >=64 fresh ids in [$nDocs, $slabStart) " +
            s"— corpus too small (nDocs=$nDocs, factor=$factor); found " +
            s"${pool.length}")
        pool
      }
    val newDocs = spark.range(nDocs, totalDocs).map { id =>
      val (vo, vc, vt, ls, la, lc, lt, so, sc, st) = bcast.value
      def freshTokens(docId: Long): Array[String] = {
        val r = new java.util.Random(docId * 2654435761L + 7)
        val n = ls(math.abs(r.nextInt(ls.length)))
        val base = Array.fill(n)(pick(vo, vc, vt, r))
        if (!skew) base
        else {
          // hot-shingle injection is part of the FRESH text itself, so
          // plants copying freshTokens(target) stay byte-identical
          val ri = new java.util.Random(docId * 2246822519L + 101)
          if (ri.nextDouble() < 0.3) {
            val pos = ri.nextInt(base.length + 1)
            base.take(pos) ++ hotPhrase ++ base.drop(pos)
          } else base
        }
      }
      // a target's text equals freshTokens(target) iff the target is
      // neither a plant (roll < 0.053) nor in the dup slab
      def isFresh(t: Long): Boolean =
        t >= nDocs && t < slabStart &&
          (t == nDocs ||
            new java.util.Random(t * 40503L + 13).nextDouble() >= 0.053)
      val rd = new java.util.Random(id * 40503L + 13)
      val roll = rd.nextDouble()
      val gap = 1 + rd.nextInt(500)
      // walk up from id-gap to the nearest FRESH id (≈94.7% of ids
      // are fresh, so this terminates in a step or two); if none
      // exists below id the plant degrades to fresh text
      var target = math.max(nDocs, id - gap)
      while (target < id && !isFresh(target)) target += 1
      val planted = target < id && isFresh(target)
      val toks =
        if (skew && id >= slabStart)                                  // dup slab
          freshTokens(slabPool(((id * 48271L) % slabPool.length).toInt.abs))
        else if (roll < 0.003 && id > nDocs && planted)               // exact dup
          freshTokens(target)
        else if (roll < 0.053 && id > nDocs && planted) {             // near dup
          val base = freshTokens(target)
          val rm = new java.util.Random(id * 6364136223846793005L + 29)
          base.map(t => if (rm.nextDouble() < 0.05) pick(vo, vc, vt, rm) else t)
        } else freshTokens(id)
      val text = toks.mkString(" ")
      val rl = new java.util.Random(id * 104729L + 3)
      // uniform path keeps the original draw order (lang first, source
      // second) so uniform regeneration stays byte-identical to
      // pre-skew runs; the skew hot-source roll burns its own stream
      val lang = pick(la, lc, lt, rl)
      val rs = new java.util.Random(id * 76543L + 11)
      val src =
        if (skew && rs.nextDouble() < 0.9) hotSource else pick(so, sc, st, rl)
      (id, text, lang, src, text.length.toLong)
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
  }
}
