package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bottom-k coordinated-sample quantile sketch as a native aggregate —
  * the mergeable bounded-memory RANK summary that completes the sketch
  * suite (KMV = distinct count, count-min = frequency, this = quantiles).
  *
  * State: the k lexicographically-smallest DISTINCT (hash, value) pairs
  * seen in the group, where `hash` is the deterministic poly hash of the
  * row's unique key. Because hashes are uniform on [0, P), the kept rows
  * are a uniform-without-replacement size-k sample of the group — and
  * because "k smallest distinct pairs" is a semilattice
  * (bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))), the sketch is
  * merge-ORDER-independent and exactly mergeable: persisted day sketches
  * fold into a week sketch identical to sketching the raw week (the KMV
  * property, spec-enforced). Quantile extraction stays OUTSIDE the
  * sketch as pure integer-arithmetic rank selection over the sampled
  * values — no float op ever touches a value, so the DuckDB oracle
  * replays estimates bit-identically (row_number over (hash, value),
  * keep rn ≤ k, rank-select).
  *
  * Memory/exchange: map tasks carry ≤ k pairs per group and merges fold
  * k+k → k, so the exchange is O(groups · k) regardless of group size —
  * unlike a permille sample, whose memory IS the sample and grows
  * linearly with the corpus (the q_quantile_sample trade).
  *
  * Determinism caveat (documented, not load-bearing on synthetic data):
  * pair order uses java.lang.Double.compare on the value, which orders
  * -0.0 < 0.0 where SQL DISTINCT/ORDER BY may collapse them; a corpus
  * holding BOTH signed zeros under colliding hashes could tie-break
  * differently cross-engine.
  *
  * Output: the pairs as array<struct<h bigint, v double>> in ascending
  * (h, v) order — deterministic set semantics, what the oracle rebuilds
  * with row_number + list ops.
  */
case class BottomKPairsAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]]
  with ExpectsInputTypes with BinaryLike[Expression] {

  require(k >= 2, s"bottom-k sketch needs k >= 2, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bottomk"

  /** (h asc, v asc by double order); equal (h, v) collapses = DISTINCT. */
  private object PairOrd extends java.util.Comparator[Array[Long]] {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c
      else java.lang.Double.compare(
        java.lang.Double.longBitsToDouble(a(1)),
        java.lang.Double.longBitsToDouble(b(1)))
    }
  }

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](PairOrd)

  private def insert(buf: java.util.TreeSet[Array[Long]], pair: Array[Long]): Unit = {
    // only insert when it would make the bottom-k set (no churn on the
    // overwhelmingly-common "pair too large" case)
    if (buf.size < k) { buf.add(pair); () }
    else if (PairOrd.compare(pair, buf.last) < 0) {
      buf.add(pair)
      if (buf.size > k) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[Array[Long]],
                      input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null) {
      insert(buf, Array(h.asInstanceOf[Long],
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])))
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Array[Long]],
                     other: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = new GenericInternalRow(Array[Any](
        p(0), java.lang.Double.longBitsToDouble(p(1))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(Array(bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKPairsAgg =
    copy(left = newLeft, right = newRight)
}
