package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkTest {

  private def tmp(): String =
    graft.store.Scratch.dir("graft_zorder")

  /** Reference Morton code on the driver. */
  private def morton(a: Int, b: Int, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1).toLong << (2 * i)
      z |= ((b >> i) & 1).toLong << (2 * i + 1)
    }
    z
  }

  test("zValue matches the reference Morton code") {
    import spark.implicits._
    val pts = for (a <- 0 to 20; b <- 0 to 20) yield (a, b)
    val got = pts.toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b"), 8))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pts.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b, 8), s"z($a,$b)")
    }
  }

  test("z-clustered layout concentrates a 2-D box query into few files") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")
    val nFiles = 16
    // clustered: z-order on the two box dimensions
    val zPath = tmp()
    ZOrder.clusteredWrite(li, "l_partkey", "l_suppkey", nFiles, zPath)
    // baseline: same file count, insertion order (no clustering)
    val basePath = tmp()
    li.repartition(nFiles).write.mode("overwrite").parquet(basePath)
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("l_partkey").between(100, 300) && col("l_suppkey").between(10, 30))
        .select(input_file_name()).distinct().count()
    val (zf, bf) = (filesTouched(zPath), filesTouched(basePath))
    info(s"box-query rows live in $zf of $nFiles z-ordered files vs $bf unclustered")
    // same rows either way...
    assert(spark.read.parquet(zPath)
      .filter(col("l_partkey").between(100, 300) && col("l_suppkey").between(10, 30)).count() ==
      spark.read.parquet(basePath)
        .filter(col("l_partkey").between(100, 300) && col("l_suppkey").between(10, 30)).count())
    // ...but the clustered layout confines them (stats-based skipping reads
    // only these files' row groups; the baseline spreads matches everywhere)
    assert(zf < bf, s"z-order must improve locality: $zf vs $bf")
    assert(zf <= nFiles / 2, s"box should be confined to a minority of files, got $zf")
  }
}
