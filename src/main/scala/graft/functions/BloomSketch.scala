package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column API over Spark's own bloom-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the
  * expressions behind runtime join filters, not exposed through
  * `functions._`). A bloom filter is THE membership structure for
  * 100 TB membership probes: the aggregate compresses an arbitrary
  * key set into `numBits` bits (one compact binary cell to
  * broadcast), and the probe is a codegen'd pure map-side predicate.
  * False-positive rate is governed by numBits vs the true item count;
  * hashing is seeded and deterministic, so a configuration verified
  * FP-free on a dataset stays FP-free.
  */
object BloomSketch {

  /** Aggregate a LONG column (hash non-long keys first, e.g.
    * `xxhash64`) into a bloom filter binary.
    */
  def bloomAgg(item: Column, estimatedItems: Long, numBits: Long): Column =
    GraftColumnBridge.toColumn(BloomFilterAggregate(
      GraftColumnBridge.toExpression(item),
      Literal(estimatedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Probe: was `item` (same hashing as at build time) possibly in the
    * aggregated set? No false negatives.
    */
  def mightContain(bloom: Column, item: Column): Column =
    GraftColumnBridge.toColumn(BloomFilterMightContain(
      GraftColumnBridge.toExpression(bloom),
      GraftColumnBridge.toExpression(item)))
}
