package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: greedy first-fit
  * of documents into fixed token-budget bins, the standard step between
  * tokenization and batching in an LLM data pipeline.
  *
  * Packing is an ordered, non-commutative fold (each bin assignment
  * depends on the running fill), so — like the battery simulation
  * (graft.operators.Battery.simulate) — it runs as a per-shard ordered
  * fold: documents are sharded by a deterministic key, sorted by
  * (shard, doc_id) *within partitions* after a shuffle keyed on the
  * shard, and each contiguous shard run folds as a streaming iterator.
  * Nothing is ever materialized per shard: memory is O(1) per task no
  * matter how large a shard grows, so the same plan holds at 100 TB.
  * Shards are the parallelism unit; a document never moves across
  * shards, so re-runs produce identical bins. Oversized documents
  * (> budget) get a bin of their own, then the running fill resets.
  */
object Packing {

  case class PackedDoc(doc_id: Long, shard: Long, bin: Long, n_tokens: Long)

  /** Greedy first-fit fold over one shard's (doc_id, n_tokens),
    * pre-sorted by doc_id. Pure streaming map over the iterator.
    */
  def packShard(
      shard: Long, docs: Iterator[(Long, Long)], budgetTokens: Long): Iterator[PackedDoc] = {
    var bin = 0L
    var fill = 0L
    var first = true
    docs.map { case (docId, n) =>
      if (!first && fill + n > budgetTokens) { bin += 1; fill = 0L }
      first = false
      fill += n
      PackedDoc(docId, shard, bin, n)
    }
  }

  /** Streaming fold over one partition of (shard, doc_id, n_tokens)
    * rows sorted by (shard, doc_id): contiguous shard runs are handed
    * to packShard one at a time through a bounded-lookahead iterator —
    * a shard is never collected into memory. Exposed (not private) so
    * the spec can assert the no-materialization law directly.
    */
  def packPartition(
      rows: Iterator[(Long, Long, Long)], budgetTokens: Long): Iterator[PackedDoc] = {
    val buf = rows.buffered
    new Iterator[Iterator[PackedDoc]] {
      def hasNext: Boolean = buf.hasNext
      def next(): Iterator[PackedDoc] = {
        val sh = buf.head._1
        packShard(sh, new Iterator[(Long, Long)] {
          def hasNext: Boolean = buf.hasNext && buf.head._1 == sh
          def next(): (Long, Long) = { val r = buf.next(); (r._2, r._3) }
        }, budgetTokens)
      }
    }.flatten // flatten drains each run before asking for the next, so order holds
  }

  /** Distributed packing: shuffle keyed by doc_id mod `numShards`,
    * sort (shard, doc_id) within partitions, streaming fold per
    * contiguous shard run. One shuffle; O(1) task memory.
    *
    * `numShards` is part of the operator's OUTPUT CONTRACT (it decides
    * which documents share a bin), so callers that need byte-stable
    * re-runs must pin it. Use `defaultNumShards` to size it from the
    * input when the grouping itself may vary run-to-run.
    */
  def pack(
      docs: DataFrame, // (doc_id, n_tokens)
      budgetTokens: Long,
      numShards: Int)(implicit spark: SparkSession): Dataset[PackedDoc] = {
    import spark.implicits._
    docs.select(
        pmod(col("doc_id").cast("long"), lit(numShards.toLong)).as("shard"),
        col("doc_id").cast("long").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions(packPartition(_, budgetTokens))
  }

  /** Shard count sized from the input's optimizer statistics: one shard
    * per ~`targetShardBytes` of (doc_id, n_tokens) rows, floored at the
    * cluster's parallelism so small inputs still use every core. At
    * 100 TB this scales the fold's parallelism with the data instead of
    * pinning it to a constant.
    */
  def defaultNumShards(
      docs: DataFrame,
      spark: SparkSession,
      targetShardBytes: Long = 64L << 20): Int = {
    val bytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    // Unknown stats fall back to the cluster's parallelism — never to
    // a degenerate huge shard count (one-doc shards would put every
    // document alone in bin 0). "Unknown" includes Spark's
    // spark.sql.defaultSizeInBytes sentinel, which is Long.MaxValue
    // EXACTLY (a valid Long — isValidLong alone does not catch it);
    // anything at or above 2^60 bytes (an exabyte) is treated as a
    // sentinel, not a measurement. Known sizes cap at 1e6 shards.
    val byStats =
      if (bytes.isValidLong && bytes.toLong < (1L << 60))
        math.min(bytes.toLong / targetShardBytes, 1000000L).toInt
      else 0
    math.max(spark.sparkContext.defaultParallelism, byStats)
  }

  /** Packing with input-sized shard count (see defaultNumShards). */
  def pack(docs: DataFrame, budgetTokens: Long)(
      implicit spark: SparkSession): Dataset[PackedDoc] =
    pack(docs, budgetTokens, defaultNumShards(docs, spark))

  /** Sequence chunking — packing's upstream sibling: split each
    * document's token stream into training windows of at most `maxLen`
    * tokens whose starts advance by `stride` (stride < maxLen gives
    * the overlapping context windows standard in LM pretraining;
    * stride = maxLen gives disjoint chunks). Emits one row per window:
    * (doc_id, chunk_idx, start_tok 1-based, chunk_tokens), windows
    * starting while tokens remain, so every token is covered and only
    * the final window of a document may be short.
    *
    * Pure per-row sequence + posexplode Column math — scan-speed, no
    * shuffle, output size (total tokens / stride) rows. The chunk
    * boundaries are token ORDINALS, not substrings: the downstream
    * tokenizer slices the real text, this operator only plans the
    * windows (same division of labor as the multimodal byte windows,
    * Multimodal.sampleFrames).
    */
  def chunk(
      docs: DataFrame, idCol: String, textCol: String,
      maxLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && maxLen >= stride,
      s"need 0 < stride <= maxLen, got stride=$stride maxLen=$maxLen")
    docs
      .select(col(idCol).as("doc_id"),
        TextOps.tokenCount(col(textCol)).as("__n"))
      .select(col("doc_id"), col("__n"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "__s")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("__s") + 1).as("start_tok"),
        least(lit(maxLen), col("__n") - col("__s")).as("chunk_tokens"))
  }

  /** Chunk-level duplicate rate — dedup measured at TRAINING-WINDOW
    * granularity: after [[chunk]]'s maxLen/stride windowing, what
    * fraction of the windows a source contributes are verbatim
    * repeats of another window (same source or not, the model sees
    * them the same number of times either way). Document-level dedup
    * (q18/q116) undercounts this: overlapping strides and shared
    * boilerplate repeat windows inside and across non-duplicate
    * documents. Window text is hashed in the scan projection
    * (xxhash64, the q96/q98 envelope) — only 8-byte hashes reach the
    * count-distinct exchange.
    */
  def chunkDupRate(
      docs: DataFrame, idCol: String, textCol: String, srcCol: String,
      maxLen: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && maxLen >= stride,
      s"need 0 < stride <= maxLen, got stride=$stride maxLen=$maxLen")
    val w = split(col(textCol), " ")
    val h = docs
      .select(col(srcCol).as("source"), w.as("__w"), size(w).as("__n"))
      .select(col("source"), col("__w"),
        posexplode(sequence(lit(0), col("__n") - 1, lit(stride)))
          .as(Seq("__ci", "__s")))
      .select(col("source"),
        xxhash64(concat_ws(" ",
          slice(col("__w"), col("__s") + 1, lit(maxLen)))).as("__h"))
    val hc = h.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    h.join(hc, "__h")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_frac",
        round(col("n_dup").cast("double") / col("n_chunks"), 6))
  }
}
