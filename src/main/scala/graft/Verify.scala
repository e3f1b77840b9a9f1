package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJson(path: String, kvs: Seq[(String, String)]): Unit =
    Files.writeString(Paths.get(path),
      kvs.map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}"))

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // extra args = optional entry-name filter (dev loop; driver passes 2)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // int64-micros timestamps (Iceberg's mandated encoding): footer
      // stats exist, unlike deprecated INT96 — enables the footer-
      // inventory commit fast path (GraftTable.footerInventory)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.GraftLocalFileSystem") // fork-free local chmod
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixtures.reapLegacyNames() // orphaned pre-r16 hashCode-keyed dirs
    new java.io.File(outDir).mkdirs()

    val todo = SparkEntry.queries
      .filter(kv => only.isEmpty || only.contains(kv._1))

    // oracle_sql.json is written BEFORE any query runs: round 12's driver
    // artifact came back `{}` even though every entry dumped cleanly,
    // because the checker step downstream died — and an oracle file that
    // only exists after the LAST entry means any mid-run kill (time
    // budget, OOM) grades as zero instead of "the entries dumped so far".
    writeJson(s"$outDir/oracle_sql.json",
      SparkEntry.oracleSql.toSeq.map { case (k, v) => k -> q(v) })

    val errors = Seq.newBuilder[(String, String)]
    val timings = Seq.newBuilder[(String, Double)]
    var produced = 0
    // _summary.json: cheap driver-side validation handle (n_entries +
    // per-entry status), rewritten after every entry so a killed run
    // still documents exactly how far it got.
    val status = Seq.newBuilder[(String, String)]
    def flush(): Unit = {
      writeJson(s"$outDir/_errors.json",
        errors.result().map { case (k, v) => k -> q(v) })
      // Locale.ROOT: a comma-decimal default locale would emit 1,234
      // and break the JSON the driver/dev side parses
      writeJson(s"$outDir/_timings.json",
        timings.result().map { case (k, v) =>
          k -> String.format(java.util.Locale.ROOT, "%.3f", Double.box(v)) })
      val st = status.result()
      writeJson(s"$outDir/_summary.json", Seq(
        "n_total" -> todo.size.toString,
        "n_done" -> st.size.toString,
        "n_ok" -> produced.toString,
        "entries" -> st.map { case (k, v) => s"${q(k)}: ${q(v)}" }
          .mkString("{", ",", "}")))
    }
    flush()
    todo.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        produced += 1
        status += name -> "ok"
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
        status += name -> "error"
      }
      timings += name -> (System.nanoTime() - t0) / 1e9
      flush()
    }
    spark.stop()
    // A run that produced no result dumps is a broken run, not a pass —
    // exit nonzero so a silent no-op can never masquerade as green
    // (round 11's driver artifact came back `{}` with no signal).
    // Counts only writes from THIS run: a reused outDir's stale dirs
    // from a previous run must not vouch for an empty one.
    if (produced == 0) {
      System.err.println(s"[verify] FATAL: no result dirs written to $outDir")
      sys.exit(2)
    }
    // NOTE: per-entry failures stay exit-0 on purpose — they are recorded
    // in _errors.json and the per-entry artifacts still let the driver
    // grade the surviving entries; only the produced-nothing case aborts.
  }
}
