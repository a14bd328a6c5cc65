package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout clustering keys — the storage-side half of the 100 TB
  * story. A table sorted (or range-partitioned) by a space-filling-curve
  * key clusters EVERY interleaved dimension at once, so parquet row-group
  * min/max stats prune multi-dimensional predicates that a single-column
  * sort can only prune on its leading column. This is the standard
  * Z-ORDER/clustering primitive of large table formats, expressed as a
  * plain deterministic column: `df.repartitionByRange(col("zkey"))
  * .sortWithinPartitions("zkey")` before the write is the whole layout
  * job, and nothing at read time changes — pruning falls out of stats.
  *
  * All bit arithmetic is integer (`shiftleft`/`shiftright`/`&`), so the
  * key is engine-reproducible and the DuckDB oracle replays it exactly.
  */
object Layout {

  /** Morton (Z-order) interleave of `coords`, each pre-quantized by the
    * caller to a nonnegative integer < 2^bits. Bit b of dim d lands at
    * output bit b·ndims + d, so the key is monotone in each coordinate
    * with the others fixed — which is what makes the corner bound of
    * [[zRangeBound]] valid. ndims·bits ≤ 62.
    *
    * A constant-size expression tree (ndims·bits terms, all codegen'd
    * built-ins) — NOT the literal-array trap (no data-dependent plan
    * growth; 32 terms for 2×16 bits).
    */
  def zorder(coords: Seq[Column], bits: Int): Column = {
    val n = coords.size
    require(n >= 1 && n * bits <= 62, s"ndims=$n bits=$bits overflows")
    coords.zipWithIndex.flatMap { case (c, d) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + d)
      }
    }.reduce(_ + _)
  }

  /** Driver-side twin of [[zorder]] for computing literal range bounds. */
  def zorderLong(coords: Seq[Long], bits: Int): Long = {
    val n = coords.size
    coords.zipWithIndex.map { case (c, d) =>
      (0 until bits).map(b => ((c >> b) & 1L) << (b * n + d)).sum
    }.sum
  }

  /** The coarse Z-range containing an axis-aligned box: because the
    * Morton key is monotone per coordinate, z(lower corner) ≤ z(p) ≤
    * z(upper corner) for every p in the box — so a storage layout sorted
    * by zkey serves the box from the [zmin, zmax] key range (a LOOSE
    * superset: the curve leaves and re-enters the box; the exact
    * predicate refines the survivors, and the superset/exact ratio is
    * the pruning-selectivity diagnostic).
    */
  def zRangeBound(lower: Seq[Long], upper: Seq[Long], bits: Int): (Long, Long) =
    (zorderLong(lower, bits), zorderLong(upper, bits))
}
