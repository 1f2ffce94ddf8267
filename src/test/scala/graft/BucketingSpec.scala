package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the storage-layout half of the 100 TB
  * design: two tables bucketed on the join key by the same bucket count
  * sort-merge join with ZERO shuffle exchanges. */
class BucketingSpec extends AnyFunSuite with SparkTest {

  test("bucketed-by-key tables sort-merge join with no shuffle") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val customer = spark.read.parquet(s"$sf001/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    // the in-memory catalog forgets tables between JVMs but their warehouse
    // directories survive — clear them or CREATE TABLE refuses the location
    Seq("orders_b", "customer_b").foreach { t =>
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(s"/tmp/graft_warehouse/$t"))
    }
    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      // the JOIN itself must be exchange-free; the groupBy above it shuffles
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must not re-shuffle its inputs:\n$plan")
      // and it still computes the right answer
      val viaPlain = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(viaPlain).isEmpty && viaPlain.exceptAll(joined).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
