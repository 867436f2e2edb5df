package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: greedy first-fit
  * of documents into fixed token-budget bins, the standard step between
  * tokenization and batching in an LLM data pipeline.
  *
  * Packing is an ordered, non-commutative fold (each bin assignment
  * depends on the running fill), so — like the battery simulation — it
  * runs as a per-shard ordered fold: documents are sharded by a
  * deterministic key, sorted by id within the shard, and each shard
  * folds independently. Shards are the parallelism unit: at 100 TB
  * packing is embarrassingly parallel across shards while staying
  * byte-deterministic, and a document never moves across shards so
  * re-runs produce identical bins. Oversized documents (> budget) get
  * a bin of their own, then the running fill resets.
  */
object Packing {

  case class PackedDoc(doc_id: Long, shard: Long, bin: Long, n_tokens: Long)

  /** Greedy first-fit fold over one shard's (doc_id, n_tokens),
    * pre-sorted by doc_id.
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

  /** Distributed packing: shard by doc_id mod `numShards`, order by
    * doc_id inside the shard, fold. One shuffle on the shard key.
    */
  def pack(
      docs: DataFrame, // (doc_id, n_tokens)
      budgetTokens: Long,
      numShards: Int)(implicit spark: SparkSession): Dataset[PackedDoc] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .as[(Long, Long)]
      .groupByKey(_._1 % numShards)
      .flatMapGroups { (shard, it) =>
        packShard(shard, it.toSeq.sortBy(_._1).iterator, budgetTokens)
      }
  }
}
