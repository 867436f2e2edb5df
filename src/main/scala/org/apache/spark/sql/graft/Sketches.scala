package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column bridges for Spark's internal Bloom-filter expressions (the
  * machinery behind runtime join-filter pushdown, exposed here for the
  * contamination gate): `bloom_filter_agg` folds LONG hashes into one
  * compact binary sketch; `might_contain` probes it. The sketch is the
  * scale lever — a reference n-gram set too big to broadcast exactly
  * still fits as a few-MB Bloom blob with a chosen false-positive
  * rate, and false positives are removed downstream by an exact join
  * over the (tiny) candidate set, so outputs stay exact.
  */
object Sketches {
  def bloom_filter_agg(hashes: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashes),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  def might_contain(bloom: Column, hash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(hash)))
}
