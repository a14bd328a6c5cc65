package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("Column zorder is bit-equal to the driver-side twin, 2-D and 3-D") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong, rnd.nextInt(16).toLong))
    val got2 = rows.toDF("x", "y", "z")
      .select(col("x"), col("y"),
        Layout.zorder(Seq(col("x"), col("y")), 8).as("zk"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (x, y, zk) =>
      assert(zk == Layout.zorderLong(Seq(x, y), 8)) }
    val got3 = rows.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        Layout.zorder(Seq(col("x"), col("y"), col("z")), 4).as("zk"))
      .as[(Long, Long, Long, Long)].collect()
    // a 4-bit interleave sees exactly the low 4 bits of each coordinate
    got3.foreach { case (x, y, z, zk) =>
      assert(zk == Layout.zorderLong(Seq(x & 15, y & 15, z & 15), 4)) }
  }

  test("corner bound: z(ll) <= z(p) <= z(ur) for every p in the box") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val xlo = rnd.nextInt(200).toLong; val xhi = xlo + rnd.nextInt(56)
      val ylo = rnd.nextInt(200).toLong; val yhi = ylo + rnd.nextInt(56)
      val (zlo, zhi) = Layout.zRangeBound(Seq(xlo, ylo), Seq(xhi, yhi), 8)
      for (_ <- 0 until 20) {
        val px = xlo + rnd.nextInt((xhi - xlo + 1).toInt)
        val py = ylo + rnd.nextInt((yhi - ylo + 1).toInt)
        val z = Layout.zorderLong(Seq(px, py), 8)
        assert(z >= zlo && z <= zhi,
          s"z($px,$py)=$z outside [$zlo,$zhi] for box [$xlo,$xhi]x[$ylo,$yhi]")
      }
    }
  }

  test("zorder keys preserve per-coordinate monotonicity") {
    for (x <- 0L until 32L; y <- 0L until 32L) {
      if (x < 31) assert(Layout.zorderLong(Seq(x + 1, y), 5) >
        Layout.zorderLong(Seq(x, y), 5))
      if (y < 31) assert(Layout.zorderLong(Seq(x, y + 1), 5) >
        Layout.zorderLong(Seq(x, y), 5))
    }
  }
}
