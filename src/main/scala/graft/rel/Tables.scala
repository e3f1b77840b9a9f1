package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All timestamps in the test data are timezone-less parquet timestamps
  * (ms for lineitem/orders, ns for events); Spark reads ms as
  * TIMESTAMP_NTZ, DuckDB as naive TIMESTAMP — semantics agree under the
  * UTC session timezone both engines run with.
  *
  * events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
  * as a timestamp; it is read as a raw nanosecond LONG
  * (spark.sql.legacy.parquet.nanosAsLong) and floor-truncated to µs with
  * integer division — exactly DuckDB's ns→µs conversion, so oracles agree.
  * (Float division would lose precision: ns-since-epoch ≈ 1.7e18 > 2^53.)
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
