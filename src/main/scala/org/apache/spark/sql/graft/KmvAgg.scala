package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native aggregate —
  * the bounded-memory cardinality estimator (Bar-Yossef et al. 2002
  * family; the same theta-sketch core Apache DataSketches ships): keep
  * the k smallest DISTINCT hash values seen; with hashes uniform on
  * [0, P), the k-th smallest estimates density k/nd, so
  * nd ≈ (k-1)·P / h_k.
  *
  * Why an aggregate and not a window/groupBy form: the whole point at
  * 100 TB is PARTIAL AGGREGATION — each map task keeps at most k longs
  * per group and merges combine k+k → k, so the exchange carries
  * O(groups · k) regardless of corpus size, where the relational
  * twin (distinct + per-group rank) shuffles every distinct key. The
  * estimator itself stays OUTSIDE the sketch (integer arithmetic over
  * the returned array) so the DuckDB oracle replays it from the same
  * sorted-array semantics.
  *
  * Output: the sorted (ascending) array of the ≤ k smallest distinct
  * hash values — deterministic set semantics, merge-order-independent,
  * which is what lets the oracle rebuild it with list_sort + slice.
  * Nulls are skipped (null key = no observation).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only insert when it would make the k-min set (avoids churn on
      // the overwhelmingly-common "hash too large" case)
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last) { buf.add(h); if (buf.size > k) { buf.pollLast(); () } }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k) { buf.add(h); () }
      else if (h < buf.last) { buf.add(h); if (buf.size > k) { buf.pollLast(); () } }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}
