package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All timestamps in the test data are timezone-less parquet timestamps;
  * Spark reads µs/ms encodings as TIMESTAMP_NTZ, DuckDB as naive
  * TIMESTAMP — semantics agree under the UTC session timezone both
  * engines run with.
  *
  * The harness has regenerated events.ts with different physical
  * encodings across rounds (parquet TIMESTAMP(NANOS) in rounds ≤6, µs
  * today), so the loader adapts to whatever it reads instead of assuming
  * one encoding:
  *   - ns: Spark 4 refuses to read NANOS as a timestamp; with
  *     spark.sql.legacy.parquet.nanosAsLong it arrives as a raw LONG and
  *     is floor-truncated to µs with integer division — exactly DuckDB's
  *     ns→µs conversion, so oracles agree. (Float division would lose
  *     precision: ns-since-epoch ≈ 1.7e18 > 2^53.)
  *   - µs/ms: read natively as TIMESTAMP_NTZ, passthrough cast.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize a timestamp column to `target` ("timestamp_ntz" for batch
    * queries, "timestamp" for streaming watermarks) regardless of how the
    * parquet encoded it: a raw LONG (ns read under nanosAsLong) is
    * floor-divided to µs; a natively-read timestamp is just cast. Under
    * the UTC session timezone the NTZ↔LTZ cast is wall-clock-preserving,
    * so both targets agree with the DuckDB oracle. */
  def normalizeTs(df: DataFrame, colName: String = "ts",
                  target: String = "timestamp_ntz"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName,
          timestamp_micros(expr(s"$colName div 1000")).cast(target))
      case TimestampNTZType | TimestampType =>
        df.withColumn(colName, col(colName).cast(target))
      case other: DataType =>
        throw new IllegalStateException(
          s"unexpected dtype for $colName: $other (expected LONG ns, " +
            "TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Timestamp columns per table — each is read through [[normalizeTs]]
    * so a future re-encoding of the test data (µs→ns, like the one that
    * hit events) is absorbed instead of breaking analysis. */
  private val tsColumns: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "orders" -> Seq("o_orderdate"),
    "lineitem" -> Seq("l_shipdate"))

  /** PLAN memo, not a data cache: `spark.read.parquet` eagerly lists
    * the path and reads a footer to infer the schema — ~50-100 ms of
    * driver-side work per call (measured via the DevProfile sampler,
    * r18) that every entry re-paid on every bench pass. The memo hands
    * back the same immutable DataFrame (logical plan) per (session,
    * dir, table); every ACTION still scans the parquet — nothing about
    * query execution is cached. Keyed on the session OBJECT (identity
    * equality, the RelCache convention) with stopped-session eviction.
    *
    * Staleness guard: the eager read also pins the FILE LISTING into
    * the plan, so a memo hit on a path that has since changed (files
    * appended/removed — e.g. s04's source-append rebuild) would
    * silently serve the old file set. Each entry therefore records a
    * LISTING FINGERPRINT at build time — a hash of the path's own mtime
    * plus every child's (name, length, mtime) — and rebuilds on
    * mismatch: one local directory listing per call (~µs for the
    * table-count directories in play) against the 50-100 ms plan build.
    * The r18 guard was the directory mtime alone, which (a) has 1 s
    * granularity on some filesystems, missing a same-second replace,
    * and (b) is 0 for any non-plain-local path, silently degrading to
    * never-invalidate (r18 ADVICE); fingerprint 0 now means "unknown"
    * and forces a rebuild every call instead. */
  private val loadMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), (Long, DataFrame)]

  /** Listing fingerprint of a local path; 0 = unknown (missing path or
    * a non-plain-local URI java.io cannot stat) — never memoizable. */
  private def listingFingerprint(path: String): Long = {
    val f = new java.io.File(path)
    if (!f.exists) return 0L
    var h = 1125899906842597L
    def mix(v: Long): Unit = { h = h * 31 + v }
    mix(f.lastModified)
    if (f.isFile) { mix(f.length) }
    else {
      val kids = f.listFiles()
      if (kids == null) return 0L
      kids.sortBy(_.getName).foreach { k =>
        mix(k.getName.hashCode.toLong); mix(k.length); mix(k.lastModified)
      }
    }
    if (h == 0L) 1L else h
  }

  private def memoized(spark: SparkSession, dir: String, key: String,
                       path: String)(build: => DataFrame): DataFrame = {
    loadMemo.filterInPlace { case ((owner, _, _), _) =>
      !owner.sparkContext.isStopped
    }
    val fp = listingFingerprint(path)
    loadMemo.get((spark, dir, key)) match {
      case Some((m, df)) if m != 0L && m == fp => df
      case _ =>
        val df = build
        loadMemo.put((spark, dir, key), (fp, df))
        df
    }
  }

  /** Memoized RAW parquet read of `dir/file` — the same plan-level memo
    * as [[load]] for call sites that need the unnormalized relation or
    * just its schema (StreamOps' file-stream sources, the maintenance
    * demos' seed reads). Sets nanosAsLong first, like [[load]], so a
    * ns-encoded file is readable whichever call comes first. */
  def raw(spark: SparkSession, dir: String, file: String): DataFrame =
    memoized(spark, dir, s"raw:$file", s"$dir/$file") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$file")
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    memoized(spark, dir, name, s"$dir/$name.parquet") {
      val cols = tsColumns.getOrElse(name, Seq.empty)
      // harmless when the data is µs; required to read a ns encoding at all
      if (cols.nonEmpty)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      cols.foldLeft(spark.read.parquet(s"$dir/$name.parquet")) {
        (df, c) => normalizeTs(df, c)
      }
    }
}
