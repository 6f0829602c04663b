package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ZOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits: a→even positions, b→odd positions") {
    // a=3 (011), b=5 (101): positions 0..5 get a0=1 b0=1 a1=1 b1=0 a2=0 b2=1
    // → 0b100111 = 39
    val out = Seq((3L, 5L)).toDF("qa", "qb")
      .select(ZOrder.zvalue("qa", "qb", 3).cast("long")).head().getLong(0)
    assert(out === 39L)
    // identity checks: z(0,0)=0; z(2^k-1, 0) spreads a over even bits
    val z = Seq((7L, 0L)).toDF("qa", "qb")
      .select(ZOrder.zvalue("qa", "qb", 3).cast("long")).head().getLong(0)
    assert(z === (1L | (1L << 2) | (1L << 4)), "a bits land on even positions only")
  }

  test("both dialect renderings agree on Spark") {
    // the DuckDB rendering is plain <</>>/&/| — Spark can parse it too, so
    // cross-check the two generated strings on the same engine
    val df = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b))).toDF("qa", "qb")
    val mismatch = df.select(
        expr(ZOrder.zvalueSparkSql("qa", "qb", 6)).cast("long").as("s"),
        expr(ZOrder.zvalueDuckSql("qa", "qb", 6)).cast("long").as("d"))
      .filter($"s" =!= $"d").count()
    assert(mismatch === 0L)
  }

  test("layout clusters BOTH dimensions: per-partition ranges shrink vs single-column sort") {
    // uniform 64x64 grid; 16 output partitions. A single-column (qa) sort
    // leaves qb's full range (63) in every partition; z-order layout must
    // give every partition a materially narrower qb range too.
    val grid = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("qa", "qb").withColumn("zv", ZOrder.zvalue("qa", "qb", 6))
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val s = df.withColumn("p", spark_partition_id())
        .groupBy("p").agg((max("qa") - min("qa")).as("sa"), (max("qb") - min("qb")).as("sb"))
        .agg(avg("sa"), avg("sb")).head()
      (s.getDouble(0), s.getDouble(1))
    }
    val (zA, zB) = spans(ZOrder.layout(grid, col("zv"), 16))
    val (sA, sB) = spans(grid.repartitionByRange(16, col("qa")).sortWithinPartitions(col("qa")))
    assert(sB > 55.0, s"sanity: qa-sort leaves qb unclustered (avg span $sB)")
    assert(zA < 32.0 && zB < 32.0,
      s"z-order must bound both dims' per-partition spans, got qa=$zA qb=$zB")
    assert(zB < sB / 2, s"z-order qb span $zB should be far below qa-sort's $sB")
  }
}
