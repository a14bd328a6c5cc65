package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge to Spark's internal bloom-filter expressions (the machinery behind
  * AQE's InjectRuntimeFilter, which Spark only applies to equi-joins'
  * probe-side reduction — not to anti-joins). graft uses them to pre-filter
  * ANTI-join inputs: see `graft.operators.Skew.bloomAntiJoin`.
  */
object BloomShim {

  /** Build a bloom filter over `keyExpr` of `df` and return its serialized
    * bytes. One distributed aggregation (partial filters OR-merged), tiny
    * result on the driver — the standard runtime-filter build.
    */
  def buildBloom(df: DataFrame, key: Column, estimatedItems: Long): Array[Byte] = {
    val hashed = new XxHash64(Seq(ColumnShim.expression(key)))
    val agg = new BloomFilterAggregate(hashed, estimatedItems)
      .toAggregateExpression()
    val row = df.select(ColumnShim.column(agg)).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Predicate: might `key` be in the serialized filter? False ⇒ definitely
    * absent (bloom filters have no false negatives); true ⇒ present or a
    * false positive.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      new XxHash64(Seq(ColumnShim.expression(key)))))
}
