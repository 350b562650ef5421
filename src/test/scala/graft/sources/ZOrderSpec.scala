package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  // independent reference interleave: bit i of a -> 2i, bit i of b -> 2i+1
  private def morton(a: Long, b: Long): Long = {
    var k = 0L
    for (i <- 0 until 32) {
      k |= ((a >> i) & 1L) << (2 * i)
      k |= ((b >> i) & 1L) << (2 * i + 1)
    }
    k
  }

  test("zOrderKey matches the reference bit interleave") {
    val cases = Seq((0L, 0L), (3L, 1L), (2L, 3L), (255L, 0L), (0L, 255L),
      (123456789L, 987654321L), ((1L << 31) - 1, (1L << 31) - 1))
    val df = cases.toDF("a", "b")
    val got = df.select(col("a"), col("b"),
      ZOrder.zOrderKey(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == morton(a, b), s"($a, $b): got $z expected ${morton(a, b)}")
    }
    // hand-checked: a=0b10 -> pos 2; b=0b11 -> pos 1,3 => 0b1110
    assert(morton(2L, 3L) == 14L)
  }

  test("writeZOrdered files cover compact ranges in BOTH dimensions") {
    val wd = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    // 32x32 grid of (x, y) cells, shuffled input order
    val grid = scala.util.Random.shuffle(
      (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)).toList)
      .toDF("x", "y")
    ZOrder.writeZOrdered(grid, "x", "y", numFiles = 16, path = s"$wd/z")
    val files = new java.io.File(s"$wd/z").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length >= 8)
    // each file's x-range AND y-range must be much tighter than the full
    // 0..31 extent (a single-column sort leaves the other column's range
    // at full width in every file)
    val spans = files.map { f =>
      val r = spark.read.parquet(f).agg(
        max("x") - min("x"), max("y") - min("y")).head()
      (r.getLong(0), r.getLong(1))
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    assert(avgX <= 16 && avgY <= 16, s"avg spans ($avgX, $avgY) not compact")
  }
}
