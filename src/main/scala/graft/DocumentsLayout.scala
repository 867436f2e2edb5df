package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical layout of the documents corpus — the bucketing counterpart
  * to [[ReadingsLayout]]'s partition pruning.
  *
  * Every cross-document curation operator re-attaches its per-document
  * result by `doc_id` (exact-dedup keepers, contamination hits,
  * near-dup cluster labels, packing assignments — see
  * `Curation.curationPipeline`), so at 100 TB the corpus-sized side of
  * each of those joins would re-shuffle the whole corpus once per
  * operator. Writing the corpus ONCE as a `bucketBy(doc_id)` table
  * moves that cost to write time: a bucketed scan reports
  * `HashPartitioning(doc_id, buckets)`, so every id-keyed join or
  * aggregation downstream consumes the corpus without an exchange —
  * only the (small, already-aggregated) operator outputs shuffle, and
  * `sortBy(doc_id)` additionally drops the sort from sort-merge joins.
  *
  * Bucket count is a write-time scale knob: buckets ≈ corpus bytes /
  * target task size (128–512 MB). The testdata default of 8 keeps the
  * fixture small; a 100 TB corpus wants tens of thousands.
  *
  * Bucketed tables need a catalog entry (the bucket spec lives in table
  * metadata, not in parquet files), hence saveAsTable with an explicit
  * external path rather than a bare parquet write.
  */
object DocumentsLayout {

  def write(
      docs: DataFrame, path: String,
      table: String = "documents_bucketed", buckets: Int = 8): Unit = {
    // No pre-emptive DROP: overwrite mode replaces the catalog entry
    // atomically at commit, so a mid-write failure leaves the PREVIOUS
    // table readable instead of no table at all (and no table name is
    // ever interpolated into raw SQL)
    docs.write.mode("overwrite")
      .bucketBy(buckets, "doc_id").sortBy("doc_id")
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String = "documents_bucketed"): DataFrame =
    spark.table(table)
}
