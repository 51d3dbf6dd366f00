package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout control: Z-order (Morton) clustering for multi-dimension
  * data skipping — the write-side lever that makes a 100 TB table
  * selectively readable on MORE than one predicate column.
  *
  * A single-column sort gives perfect parquet min/max pruning on that
  * column and none on any other; interleaving the bits of two key
  * columns and range-partitioning by the interleave gives every output
  * file a bounded range in BOTH dimensions (each file covers a
  * rectangle-ish region of the key plane), so row-group stats prune
  * point/range queries on either column. Same design as Delta/Iceberg
  * `ZORDER BY`, expressed with plain Spark arithmetic — the z-value is
  * a fold of shift/mask terms that Catalyst codegens, no UDF.
  *
  * The reference has no storage layout at all (ChromaDB owns its
  * files); this is engine-level functionality a lake deployment needs.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Monotone locality: close (a, b) pairs get close z-values. Callers
    * bucket/offset their columns into [0, 2^bits) first — at 21 bits × 2
    * the result stays under 2^42 (exact in a long and in the oracle's
    * BIGINT arithmetic). */
  def zValue(a: Column, b: Column, bits: Int = 21): Column =
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)

  /** Write `df` clustered by `zCol` into `nFiles` range-partitioned,
    * internally sorted files: repartitionByRange samples z-value
    * boundaries (one pass), each task writes one z-contiguous file, so
    * file-level min/max stats are tight on every column folded into the
    * z-value. */
  def zorderWrite(df: DataFrame, zCol: Column, path: String,
                  nFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
