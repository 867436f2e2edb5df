package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout planning operators — the write-side half of a
  * 100 TB deployment. Reading fast at scale is mostly decided before
  * the first query runs: how rows were clustered into files (data
  * skipping) and how small files were compacted (task/scheduler
  * overhead). Both planners here are pure declarative plans over file/
  * row metadata — no data movement, no driver state — so they run as
  * cheaply against a 100 TB table's manifest as against a test table.
  *
  * Everything is exact integer/window arithmetic, so both ops are
  * DuckDB-oracle-gated (q173/q174) rather than spec-only.
  */
object Layout {

  /** Morton (Z-order) interleave of two non-negative integer
    * dimensions, `bits` bits each: bit b of x lands at position 2b,
    * bit b of y at 2b+1. The standard multi-dimensional clustering
    * key (Morton 1966; every lakehouse `OPTIMIZE ZORDER BY`):
    * sorting by the interleaved value gives files that are tight in
    * BOTH dimensions, so min/max file statistics prune scans for
    * predicates on either column — a linear sort only ever serves its
    * leading column.
    *
    * Pure bitwise Column algebra (shift/and/or over longs), evaluated
    * inside the scan under whole-stage codegen; exact in both engines.
    */
  def mortonValue(x: Column, y: Column, bits: Int): Column =
    mortonValueN(Seq(x, y), bits)

  /** N-dimensional Morton interleave (`OPTIMIZE ZORDER BY (c1 … cN)`):
    * bit b of dimension d lands at position b·N + d. Total bits must
    * fit a long (N·bits ≤ 63). Pure shift/and/or Column algebra, one
    * term per (dim, bit), codegen'd inside the scan.
    */
  def mortonValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 1, "at least one dimension")
    require(bits >= 1 && n * bits <= 63,
      s"n*bits must be in [1,63], got $n*$bits")
    (for {
      b <- 0 until bits
      (d, di) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * n + di))
      .reduce(_ bitwiseOR _)
  }

  /** Per-file min/max statistics under an equi-width range bucketing
    * of `key` into `files` buckets — the data-skipping readout a
    * clustered write would produce. Equi-width on the key (not
    * ntile/repartitionByRange) keeps the assignment a pure map-side
    * expression against two broadcast scalars (global key min/max):
    * no global sort, no sampled — hence nondeterministic — range
    * boundaries, no single-partition window. A production writer
    * would `repartitionByRange(files, key)` for balanced output; the
    * bucket → file SEMANTICS (contiguous key ranges) are identical,
    * and this form is oracle-exact.
    */
  private def fileStats(df: DataFrame, key: Column, files: Int,
      layout: String): DataFrame = {
    val keyed = df.withColumn("k", key)
    val bounds = keyed.agg(min(col("k")).as("kmin"), max(col("k")).as("kmax"))
    keyed.crossJoin(broadcast(bounds))
      .withColumn("file", least(lit(files - 1),
        floor((col("k") - col("kmin")) * files /
          (col("kmax") - col("kmin") + lit(1L)))).cast("long"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .withColumn("layout", lit(layout))
      .select(col("layout"), col("file"), col("n"),
        col("x_min"), col("x_max"), col("y_min"), col("y_max"))
  }

  /** Per-dimension equi-width normalization of (x, y) onto the
    * `bits`-bit lattice: mx = ⌊(x − min) · 2^bits / span⌋ — the step
    * every production z-order implementation runs BEFORE interleaving
    * (Delta's OPTIMIZE ZORDER range-IDs each column first). Without
    * it, a dimension with a wider value range dominates the high
    * interleave bits and the curve degenerates toward a linear sort
    * on that column: measured on lineitem (l_partkey 0..2k vs
    * l_suppkey 0..100), the RAW interleave's skip ratio was 0.66 —
    * WORSE than the 0.75 of a plain x-sort — and normalization lifts
    * it above both. Two broadcast min/max scalars per dim; the scaled
    * values are exact integer floor arithmetic in both engines.
    */
  private def normalized(base: DataFrame, bits: Int): DataFrame = {
    val b = base.agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("y")).as("ymn"), max(col("y")).as("ymx"))
    base.crossJoin(broadcast(b))
      .withColumn("mx", floor((col("x") - col("xmn")) * (1L << bits) /
        (col("xmx") - col("xmn") + lit(1L))))
      .withColumn("my", floor((col("y") - col("ymn")) * (1L << bits) /
        (col("ymx") - col("ymn") + lit(1L))))
  }

  /** Z-order vs linear layout comparison for a two-column table: the
    * same rows bucketed into `files` files (a) by the Morton
    * interleave of the [[normalized]] (x, y) and (b) by x alone (the
    * linear sort a naive writer produces), with per-file min/max of
    * both dimensions. The readout IS the data-skipping story: under
    * the z-order layout every file covers a narrow range of BOTH x
    * and y (a predicate on either prunes most files); under the
    * linear layout each file spans the full y range, so y-predicates
    * prune nothing.
    *
    * Plan: two scans (one per layout), each scan → map-side bucket
    * expression against broadcast min/max scalars → one hash
    * aggregate on the file id. Nothing here is corpus-ordered: at
    * 100 TB each layout costs one pass and one `files`-sized
    * aggregate.
    */
  def zOrderLayout(df: DataFrame, xCol: String, yCol: String,
      files: Int, bits: Int): DataFrame = {
    require(files >= 1, s"files must be >= 1, got $files")
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val zkeyed = normalized(base, bits)
      .withColumn("zk", mortonValue(col("mx"), col("my"), bits))
      .select(col("x"), col("y"), col("zk"))
    fileStats(zkeyed, col("zk"), files, "zorder")
      .unionAll(fileStats(base, col("x"), files, "linear"))
      .orderBy(col("layout"), col("file"))
  }

  /** The actual clustered WRITE path (what `OPTIMIZE ZORDER BY` runs):
    * range-partition the rows on the Morton key — sampled boundaries
    * give ~equal-sized output files, the balance [[zOrderLayout]]'s
    * deterministic equi-width readout trades away for oracle
    * exactness — then sort within each partition so row groups inside
    * a file are also z-contiguous (parquet column min/max stats then
    * prune at row-group granularity too). Caller does
    * `.write.parquet(...)`; each task writes one z-contiguous file.
    *
    * Sampled `repartitionByRange` boundaries make file CONTENTS
    * nondeterministic across runs (never the row set), so this is
    * spec-verified on written files' footer stats, not oracle-gated —
    * the oracle-gated siblings are q173/q176.
    */
  def zOrderWrite(df: DataFrame, xCol: String, yCol: String,
      files: Int, bits: Int): DataFrame = {
    require(files >= 1, s"files must be >= 1, got $files")
    val (x, y) = (col(xCol).cast("long"), col(yCol).cast("long"))
    // one stats pre-pass for the per-dim normalization scalars (at
    // 100 TB a writer takes these from table statistics instead)
    val b = df.agg(min(x).as("__xmn"), max(x).as("__xmx"),
      min(y).as("__ymn"), max(y).as("__ymx"))
    val tmp = Seq("__zmx", "__zmy", "__zval",
      "__xmn", "__xmx", "__ymn", "__ymx")
    df.crossJoin(broadcast(b))
      .withColumn("__zmx", floor((x - col("__xmn")) * (1L << bits) /
        (col("__xmx") - col("__xmn") + lit(1L))))
      .withColumn("__zmy", floor((y - col("__ymn")) * (1L << bits) /
        (col("__ymx") - col("__ymn") + lit(1L))))
      .withColumn("__zval", mortonValue(col("__zmx"), col("__zmy"), bits))
      .repartitionByRange(files, col("__zval"))
      .sortWithinPartitions(col("__zval"))
      .drop(tmp: _*)
  }

  /** Quantified data-skipping readout for [[zOrderLayout]]: lay a
    * `grid`×`grid` lattice of predicate boxes over the (x, y) key
    * space (equal fractional bands between the global min/max of each
    * dimension) and count, per layout, how many files' min/max stats
    * intersect each box — exactly the pruning decision a reader's
    * file-skipping pass makes. The output is two rows (zorder,
    * linear) with the average touched-file count and the skip ratio:
    * the z-order claim as a measured number instead of an eyeballed
    * stats table.
    *
    * Everything after the two layout scans is metadata-sized: file
    * stats (2·files rows) theta-joined against broadcast boxes
    * (grid² rows), then two tiny aggregates. Integer floor arithmetic
    * throughout — oracle-exact.
    */
  def zOrderPruning(df: DataFrame, xCol: String, yCol: String,
      files: Int, bits: Int, grid: Int): DataFrame =
    pruneReadout(zOrderLayout(df, xCol, yCol, files, bits),
      df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y")), grid)

  /** Hilbert-curve index on the normalized lattice — the
    * `org.apache.spark.sql.graft.HilbertIndex` native kernel (see its
    * scaladoc for why it is not Column algebra).
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    org.apache.spark.sql.graft.Signatures.hilbert_index(x, y, bits)

  /** [[zOrderLayout]] plus a third clustering: the Hilbert curve.
    * Same normalization, same per-file stats readout — three layouts
    * (hilbert, linear, zorder) to compare in one frame.
    */
  def curveLayout(df: DataFrame, xCol: String, yCol: String,
      files: Int, bits: Int): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val hkeyed = normalized(base, bits)
      .withColumn("hk", hilbertValue(col("mx"), col("my"), bits))
      .select(col("x"), col("y"), col("hk"))
    zOrderLayout(df, xCol, yCol, files, bits)
      .unionAll(fileStats(hkeyed, col("hk"), files, "hilbert"))
      .orderBy(col("layout"), col("file"))
  }

  /** [[zOrderPruning]] over all three curves — the head-to-head skip
    * readout. Both curves beat linear decisively; between them the
    * winner is alignment-dependent: on a power-of-two-ALIGNED box
    * lattice Morton's axis-aligned quadrants fit the boxes exactly
    * (lineitem 4×4 readout: zorder 0.9375, hilbert 0.9102, linear
    * 0.75), while Hilbert's edge-connected ranges win on unaligned /
    * arbitrary range predicates — the reason Iceberg/Hudi offer both.
    */
  def curvePruning(df: DataFrame, xCol: String, yCol: String,
      files: Int, bits: Int, grid: Int): DataFrame =
    pruneReadout(curveLayout(df, xCol, yCol, files, bits),
      df.select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y")), grid)

  /** Equi-DEPTH per-dim normalization — the quantile "range-ID" pass a
    * production `OPTIMIZE ZORDER` actually runs (each column is
    * range-bucketed before interleaving). [[normalized]]'s equi-width
    * scaling collapses on CLUSTERED keys: the scaled sf1 lineitem
    * packs 6M rows into 10 narrow key islands across a 90M range,
    * leaving most equi-width z-files empty. Cut points here are exact
    * interpolated percentiles — ONE aggregate row of 2·(2^bits−1)
    * doubles, index-sized — broadcast back, and a row's lattice
    * coordinate is the count of cuts below its value. At 100 TB the
    * writer swaps exact cuts for sampled boundaries
    * (repartitionByRange) — same semantics, bounded sampling error;
    * the exact form is what the DuckDB oracle can replay
    * (quantile_cont ≡ Spark percentile, the q05 parity).
    */
  private def normalizedEqDepth(base: DataFrame, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 12, s"depth bits must be in [1,12], got $bits")
    val n = 1 << bits
    val ps = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val cuts = base.agg(percentile(col("x"), ps).as("xcuts"),
      percentile(col("y"), ps).as("ycuts"))
    // Count-below via the native binary-search kernel: the
    // size(filter(cuts, c => v > c)) HigherOrderFunction form walks
    // all 2^bits−1 cuts interpreted per row (40 s on q179's sf0.1
    // assignment); lower_bound does log₂ compares under codegen.
    // Identical count because percentile output is sorted ascending.
    base.crossJoin(broadcast(cuts))
      .withColumn("mx", org.apache.spark.sql.graft.Signatures
        .lower_bound(col("xcuts"), col("x").cast("double")))
      .withColumn("my", org.apache.spark.sql.graft.Signatures
        .lower_bound(col("ycuts"), col("y").cast("double")))
  }

  /** [[zOrderPruning]] plus the equi-depth z-order row — the skew
    * story for layout: on clustered/skewed key distributions the
    * equi-width curve degenerates (empty files, giant spans) while the
    * quantile-normalized curve keeps every file populated and tight.
    */
  def eqDepthPruning(df: DataFrame, xCol: String, yCol: String,
      files: Int, bits: Int, depthBits: Int, grid: Int): DataFrame = {
    val base = df.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val dkeyed = normalizedEqDepth(base, depthBits)
      .withColumn("dk", mortonValue(col("mx"), col("my"), depthBits))
      .select(col("x"), col("y"), col("dk"))
    pruneReadout(
      zOrderLayout(df, xCol, yCol, files, bits)
        .unionAll(fileStats(dkeyed, col("dk"), files, "zorder_eqdepth")),
      base, grid)
  }

  private def pruneReadout(stats: DataFrame, base: DataFrame,
      grid: Int): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val bounds = base.agg(min(col("x")).as("bxmin"), max(col("x")).as("bxmax"),
      min(col("y")).as("bymin"), max(col("y")).as("bymax"))
    val boxes = bounds
      .withColumn("i", explode(sequence(lit(0), lit(grid - 1))))
      .withColumn("j", explode(sequence(lit(0), lit(grid - 1))))
      .withColumn("spanx", col("bxmax") - col("bxmin") + lit(1L))
      .withColumn("spany", col("bymax") - col("bymin") + lit(1L))
      .select(
        (col("i") * grid + col("j")).as("box"),
        (col("bxmin") + floor(col("i") * col("spanx") / grid)).as("bxlo"),
        (col("bxmin") + floor((col("i") + 1) * col("spanx") / grid) - 1)
          .as("bxhi"),
        (col("bymin") + floor(col("j") * col("spany") / grid)).as("bylo"),
        (col("bymin") + floor((col("j") + 1) * col("spany") / grid) - 1)
          .as("byhi"))
    val touched = stats.join(broadcast(boxes),
        col("x_min") <= col("bxhi") && col("x_max") >= col("bxlo") &&
        col("y_min") <= col("byhi") && col("y_max") >= col("bylo"))
      .groupBy(col("layout")).agg(count(lit(1)).as("touched"))
    val perLayout = stats.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"))
    perLayout.join(touched, "layout")
      .select(col("layout"), col("n_files"), lit(grid * grid).as("n_boxes"),
        col("touched"),
        round(lit(1.0) - col("touched") /
          (col("n_files") * lit(grid * grid)).cast("double"), 6)
          .as("skip_ratio"))
      .orderBy(col("layout"))
  }

  /** Layout-health triage: per table partition, the file-count /
    * byte-size profile and a needs-compaction verdict (≥half the
    * files under half the target size, and more than one file to
    * merge) — the monitoring pass that decides where [[compactionPlan]]
    * runs next. One metadata aggregate; at 100 TB this reads the file
    * manifest, never the data.
    */
  def layoutHealth(files: DataFrame, partCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    files.groupBy(col(partCol))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).cast("long").as("total_bytes"),
        round(avg(col(bytesCol)), 2).as("avg_bytes"),
        round(
          sum(when(col(bytesCol) < lit(targetBytes / 2), 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("small_frac"))
      .withColumn("needs_compaction",
        col("small_frac") >= 0.5 && col("n_files") > 1)
      .orderBy(col(partCol))
  }

  /** File manifest of a written dataset directory — (part, seq, file,
    * bytes) rows from the Hadoop FS listing, the REAL input
    * [[layoutHealth]] / [[compactionPlan]] consume in production.
    * Driver-side listing is manifest-scale (bounded by file count, the
    * same bound a table format's metadata layer carries), never the
    * data; at 100 TB a lakehouse table would serve this from its
    * manifest files instead.
    */
  def fileManifest(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    import spark.implicits._
    parts.zipWithIndex.toSeq
      .map { case (st, i) => (dir, i.toLong, st.getPath.getName, st.getLen) }
      .toDF("part", "seq", "file", "bytes")
  }

  /** Bloom-filter file skipping vs zone maps — the point-lookup half
    * of the data-skipping story. Zone maps (per-file min/max, q173/
    * q176) prune RANGE predicates on clustered columns but are useless
    * for point lookups on a column UNcorrelated with the layout: every
    * file's [min,max] spans the probe. A per-file Bloom filter over
    * that column (what Parquet bloom_filter_enabled / Delta BLOOMFILTER
    * indexes materialize) answers "might this file contain key k?" in
    * `kHash` bit probes with no false negatives.
    *
    * Files are assigned by equi-width bucketing of `fileKeyCol` (the
    * clustered write column); `probeCol` is the lookup column that
    * scatters across files. Bit positions are md5-derived
    * (`hexDigits` hex digits → m = 16^hexDigits bits, `kHash`
    * independent salts) so both engines replay the exact filter.
    * Probes: `nProbes` present keys (md5-ranked — deterministic) and
    * `nProbes` absent keys (beyond the global max).
    *
    * Output, one row per (method, klass): files touched, truly
    * containing files, false-positive rate over the prunable
    * candidates, and the skip ratio. At scale everything here is one
    * corpus scan (bloom build = the write path's side product) + bit
    * joins that are probe-bounded (≤ 2·nProbes·kHash rows broadcast);
    * the (file, pos) bit table is capped at files · m rows and lives
    * file-local in a real writer (no shuffle — it IS the parquet
    * footer bloom).
    */
  def bloomSkipping(df: DataFrame, fileKeyCol: String, probeCol: String,
      files: Int, hexDigits: Int, kHash: Int, nProbes: Int): DataFrame = {
    require(files >= 1 && hexDigits >= 1 && hexDigits <= 8 && kHash >= 1 &&
      nProbes >= 1, s"bad config ($files, $hexDigits, $kHash, $nProbes)")
    val base = df.select(col(fileKeyCol).cast("long").as("fk"),
      col(probeCol).cast("long").as("key"))
    val fb = base.agg(min(col("fk")).as("fmin"), max(col("fk")).as("fmax"))
    val filed = base.crossJoin(broadcast(fb))
      .withColumn("file", least(lit(files - 1),
        floor((col("fk") - col("fmin")) * files /
          (col("fmax") - col("fmin") + lit(1L)))).cast("long"))
      .select(col("file"), col("key"))
    val zone = filed.groupBy(col("file"))
      .agg(min(col("key")).as("kmin"), max(col("key")).as("kmax"))
    def bitPos(key: Column, i: Int): Column =
      conv(substring(md5(concat(key.cast("string"), lit(s":$i"))),
        1, hexDigits), 16, 10).cast("long")
    def posArr(key: Column): Column =
      array((0 until kHash).map(i => bitPos(key, i)): _*)
    val bits = filed
      .select(col("file"), explode(posArr(col("key"))).as("pos")).distinct()
    val present = filed.select(col("key")).distinct()
      .withColumn("h", md5(col("key").cast("string")))
      .orderBy(col("h"), col("key")).limit(nProbes)
      .select(col("key").as("probe"), lit("present").as("klass"))
    val gm = base.agg(max(col("key")).as("gmax"))
    val absent = broadcast(gm)
      .withColumn("o", explode(sequence(lit(1L), lit(nProbes.toLong))))
      .select((col("gmax") + col("o")).as("probe"), lit("absent").as("klass"))
    val probes = present.unionAll(absent)
    val probeBits = probes.select(col("probe"), col("klass"),
      explode(posArr(col("probe"))).as("pos")).distinct()
    val required = probeBits.groupBy(col("probe"), col("klass"))
      .agg(count(lit(1)).as("req"))
    val hits = bits.join(broadcast(probeBits), "pos")
      .groupBy(col("probe"), col("klass"), col("file"))
      .agg(count(lit(1)).as("got"))
    val bloomTouch = hits.join(broadcast(required), Seq("probe", "klass"))
      .filter(col("got") === col("req"))
      .select(col("probe"), col("klass"), col("file"))
    val zoneTouch = broadcast(probes).crossJoin(zone)
      .filter(col("probe") >= col("kmin") && col("probe") <= col("kmax"))
      .select(col("probe"), col("klass"), col("file"))
    val actual = filed.join(broadcast(probes), col("key") === col("probe"))
      .select(col("probe"), col("klass"), col("file")).distinct()
    val touched = bloomTouch.withColumn("method", lit("bloom"))
      .unionAll(zoneTouch.withColumn("method", lit("zonemap")))
      .groupBy(col("method"), col("klass")).agg(count(lit(1)).as("touched"))
    val trueCnt = actual.groupBy(col("klass"))
      .agg(count(lit(1)).as("true_files"))
    val scaffold = probes.groupBy(col("klass"))
      .agg(count(lit(1)).as("n_probes"))
      .crossJoin(broadcast(
        gm.select(explode(array(lit("bloom"), lit("zonemap"))).as("method"))))
    scaffold
      .join(touched, Seq("method", "klass"), "left")
      .join(trueCnt, Seq("klass"), "left")
      .select(col("method"), col("klass"), col("n_probes"),
        coalesce(col("touched"), lit(0L)).as("touched"),
        coalesce(col("true_files"), lit(0L)).as("true_files"),
        round((coalesce(col("touched"), lit(0L)) -
            coalesce(col("true_files"), lit(0L))).cast("double") /
          (col("n_probes") * files - coalesce(col("true_files"), lit(0L))),
          6).as("fp_rate"),
        round(lit(1.0) - coalesce(col("touched"), lit(0L)).cast("double") /
          (col("n_probes") * files), 6).as("skip_ratio"))
      .orderBy(col("method"), col("klass"))
  }

  /** Sequential small-file compaction plan: within each table
    * partition, pack consecutive files (in `seqCol` order) into
    * output groups of at least `targetBytes` — the planning pass of
    * every `OPTIMIZE`/compaction job. Group assignment is the
    * running-sum bin: a file starts a new group exactly when the
    * bytes accumulated BEFORE it have crossed the next multiple of
    * `targetBytes`, i.e. `grp = floor((cumBytes - bytes) /
    * targetBytes)` — deterministic, one window over each table
    * partition's file list (file METADATA, thousands of rows per
    * partition at 100 TB, never the data), one hash aggregate.
    *
    * Output: one row per (partition, group) with the file count, total
    * bytes, and the seq range to rewrite — exactly the work list a
    * compaction executor consumes.
    */
  def compactionPlan(files: DataFrame, partCol: String, seqCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val w = Window.partitionBy(col(partCol)).orderBy(col(seqCol))
    files
      .withColumn("cum", sum(col(bytesCol)).over(w))
      .withColumn("grp",
        floor((col("cum") - col(bytesCol)) / lit(targetBytes)).cast("long"))
      .groupBy(col(partCol), col("grp"))
      .agg(count(lit(1)).as("n_files"), sum(col(bytesCol)).as("grp_bytes"),
        min(col(seqCol)).as("first_seq"), max(col(seqCol)).as("last_seq"))
      .orderBy(col(partCol), col("grp"))
  }

  /** Compaction rewrite EXECUTOR — the missing half [[compactionPlan]]
    * plans for (round-14 item 4): consume the (partition, group,
    * seq-range) work list, rewrite each multi-file group's members
    * into ONE parquet file, and swap it in. The row SET is preserved
    * exactly (the executor counts every group's input rows and refuses
    * the swap on any mismatch — a rewrite that loses or invents a row
    * must fail loudly, not land); single-file groups are left
    * untouched, so a second run over a compacted directory is a no-op
    * (idempotence, spec-enforced).
    *
    * Only SMALL files — bytes < targetBytes/2, [[layoutHealth]]'s own
    * smallness definition — enter the plan (the Delta/Iceberg OPTIMIZE
    * selection rule). This is what makes the executor IDEMPOTENT: a
    * packed bin's input is ≥ target (except the one tail bin), so its
    * rewritten output lands ≥ ~target even after re-encoding shrink
    * and is never re-selected; the sole possible sub-threshold output
    * (the tail) has no small sibling left to pair with, and 1-file
    * bins are skipped. Binning EVERY file instead (the naive reading
    * of the plan) re-merges tail/shrunken outputs forever — measured,
    * not hypothetical: the first spec run caught exactly that.
    *
    * Mechanics: group outputs are staged under `<dir>/.compact_tmp`
    * (dot-prefixed — invisible to both the parquet reader and
    * [[fileManifest]]), verified, then the staged file moves in as
    * `part-compacted-r<run>-g<grp>.parquet` and the member files are
    * deleted. The output name is UNIQUE PER RUN (`run` = one past the
    * largest run number already in the directory): a RECURRING caller
    * — [[IndexStore.compactLogIfGrown]] re-compacts the same log
    * directory forever — must never rename onto an existing compacted
    * file (a local filesystem overwrites silently, losing that file's
    * rows; HDFS refuses), and the rename's result is REQUIRED true
    * before any member is deleted, so a refused swap fails loudly with
    * every input file still in place. The remaining crash window is
    * between the (checked) rename and the member deletes — a crash
    * there leaves the group's rows DUPLICATED (output + members), the
    * recoverable direction (the loss direction is closed: nothing is
    * deleted until the output verifiably exists). The same
    * non-transactional exposure a bare-directory OPTIMIZE has anywhere
    * (a lakehouse table closes it with a manifest commit; this
    * executor targets the plain-directory layout the rest of the
    * Layout family reads). Driver state is
    * manifest-scale only (the plan + file list — bounded by file
    * count, the [[fileManifest]] bound); each group rewrite is a
    * distributed read of just that group's files.
    *
    * Returns the rewrite report, one row per plan group: files/bytes
    * in, rows carried, whether it was rewritten, and the output file.
    */
  def compactionRewrite(spark: org.apache.spark.sql.SparkSession,
      dir: String, targetBytes: Long): DataFrame = {
    import spark.implicits._
    val manifest = fileManifest(spark, dir)
      .filter(col("bytes") < lit(targetBytes / 2))
    val plan = compactionPlan(manifest, "part", "seq", "bytes", targetBytes)
    // manifest-scale collects: (seq, file) list + the plan's group rows
    val files = manifest.select(col("seq"), col("file"), col("bytes"))
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val groups = plan
      .select(col("grp"), col("n_files"), col("grp_bytes"),
        col("first_seq"), col("last_seq"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpRoot = new org.apache.hadoop.fs.Path(dir, ".compact_tmp")
    // unique-per-run output prefix: one past the largest run number
    // already present, so a recurring compaction never renames onto an
    // earlier run's output (scan is the dir listing already paid above)
    val RunName = "part-compacted-r(\\d+)-g\\d+\\.parquet".r
    val run = fs.listStatus(path).iterator.map(_.getPath.getName)
      .collect { case RunName(r) => r.toLong }
      .maxOption.getOrElse(-1L) + 1
    val report = try {
      groups.map { case (grp, nFiles, grpBytes, firstSeq, lastSeq) =>
        val members = files.filter(f => f._1 >= firstSeq && f._1 <= lastSeq)
        if (nFiles <= 1L) (grp, nFiles, grpBytes, -1L, false, members.head._2)
        else {
          val paths = members.map(m => s"$dir/${m._2}")
          val in = spark.read.parquet(paths: _*)
          val tmpDir = new org.apache.hadoop.fs.Path(tmpRoot, s"g$grp")
          in.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
          val written = fs.listStatus(tmpDir)
            .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          require(written.length == 1,
            s"compaction group $grp wrote ${written.length} files, wanted 1")
          // row-preservation gate BEFORE any destructive move
          val nIn = in.count()
          val nOut = spark.read.parquet(tmpDir.toString).count()
          require(nIn == nOut,
            s"compaction group $grp row mismatch: read $nIn wrote $nOut")
          val outName = f"part-compacted-r$run%05d-g$grp%05d.parquet"
          val dest = new org.apache.hadoop.fs.Path(dir, outName)
          // swap order: checked rename FIRST, member deletes after — a
          // refused rename (name collision, FS error) aborts with every
          // input intact instead of after the inputs are already gone
          require(fs.rename(written.head.getPath, dest),
            s"compaction group $grp rename to $dest failed; " +
              "no member deleted")
          members.foreach(m =>
            fs.delete(new org.apache.hadoop.fs.Path(dir, m._2), false))
          (grp, nFiles, grpBytes, nIn, true, outName)
        }
      }.toSeq
    } finally fs.delete(tmpRoot, true)
    report.toDF("grp", "n_files_in", "bytes_in", "n_rows", "rewritten",
      "out_file").orderBy(col("grp"))
  }
}
