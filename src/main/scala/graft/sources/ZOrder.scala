package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys for multi-column data clustering — the
  * file-skipping story at 100 TB: sorting a table by the interleaved bits
  * of two filter columns co-locates rows that are close in BOTH
  * dimensions, so parquet row-group min/max statistics prune scans for
  * predicates on EITHER column (a plain sort only prunes its leading
  * column). This is what Delta's OPTIMIZE ZORDER BY does; here it is a
  * pure-column computation usable with any writer.
  *
  * The interleave is the classic magic-number bit spread (5 shift/mask
  * rounds per operand) — plain integer column arithmetic: codegen'd by
  * Spark, bit-for-bit replicable in ANSI SQL, no UDF anywhere.
  */
object ZOrder {

  /** Spread the lower 32 bits of `x` into the even bit positions of a
    * 64-bit value. Input must be in [0, 2^32).
    */
  private[sources] def spreadBits(x: Column): Column = {
    val a = x.bitwiseAND(lit(0xFFFFFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val c = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val d = c.bitwiseOR(shiftleft(c, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x3333333333333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton interleave of two non-negative 32-bit column values: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1. Keep both inputs
    * below 2^31 for a non-negative BIGINT key (sorts correctly).
    */
  def zOrderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Write `df` clustered by the z-order of (`aCol`, `bCol`): a range
    * shuffle on the key (never a global single-partition sort) +
    * within-partition sort, so every output file covers a compact Z-curve
    * segment — tight min/max on BOTH columns in every row group. The key
    * column itself is dropped from the output.
    */
  def writeZOrdered(df: DataFrame, aCol: String, bCol: String,
                    numFiles: Int, path: String): Unit =
    df.withColumn("__z__", zOrderKey(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z__"))
      .sortWithinPartitions(col("__z__"))
      .drop("__z__")
      .write.mode("overwrite").parquet(path)
}
