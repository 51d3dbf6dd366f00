package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column wrappers over Spark's built-in bloom-filter sketch expressions
  * (the machinery behind runtime row-group filtering /
  * `InjectRuntimeFilter`, exposed here for explicit semi-join
  * prefiltering).
  *
  * The aggregate hashes values with xxhash64 (Spark's convention — the
  * same hash `might_contain` probes with), builds an
  * `org.apache.spark.util.sketch.BloomFilter`, and emits it as ONE
  * binary row; the probe side tests membership map-side. No false
  * negatives by construction; false-positive rate is set by
  * bits-per-item. */
object BloomFunctions {

  /** Aggregate a column into a bloom filter binary. `numBits` ≈
    * items × bits-per-item (10 bits/item ≈ 1% FPR). */
  def bloomAgg(value: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(value)),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  /** Membership probe against a one-row bloom-binary frame (false
    * positives possible, false negatives impossible). `might_contain`
    * requires its sketch to be a CONSTANT or scalar subquery — a plain
    * join attribute is rejected at analysis — so the build side enters
    * the probe plan as a scalar subquery, exactly how Spark's own
    * `InjectRuntimeFilter` ships its sketches: materialized once,
    * broadcast to every probe task. */
  def mightContain(bloomDf: org.apache.spark.sql.DataFrame,
                   value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloomDf.queryExecution.analyzed),
      ColumnBridge.expression(xxhash64(value))))
}
