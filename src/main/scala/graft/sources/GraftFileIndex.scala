package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** A Catalyst [[FileIndex]] over the graft manifest — the integration
  * point that makes file skipping AUTOMATIC: any `WHERE` predicate a
  * query pushes into the scan is tested against each data file's
  * manifest statistics (min/max bounds AND per-column null counts), and
  * non-overlapping files are never listed to the parquet reader. This is
  * the same architecture Delta Lake's TahoeFileIndex and Iceberg's
  * SparkScan use — the table format owns file listing, Catalyst owns
  * everything else (the parquet row-group pruning below us still applies
  * to the files we do list).
  *
  * Scale: the ONLY driver-resident state is the (path, size) pair per
  * live file — the same footprint Spark's own InMemoryFileIndex keeps
  * for any parquet scan. The per-column min/max and null-count maps stay
  * in the manifest parquet and are evaluated AS A SPARK JOB at
  * [[listFiles]] time: pushed predicates are translated to a keep-file
  * Column over the manifest rows, the manifest is filtered
  * distributively, and only the surviving (path, size) list returns to
  * the driver. At ~1M files the bounds maps would be multi-GB of driver
  * heap if materialized; here they never leave the executors.
  *
  * Snapshot isolation: the manifest path list is pinned at construction
  * (and re-pinned by [[refresh]]), so a concurrent commit never changes
  * what an already-planned query reads.
  *
  * Unknown or non-translatable predicates keep every file (superset
  * guarantee; the row filter still runs) — and when NO pushed predicate
  * is translatable the manifest job is skipped entirely and the cached
  * (path, size) list is served.
  *
  * Evolution note: this path serves tables whose schema never evolved
  * (one schema generation). [[GraftTable.read]] handles evolved tables
  * via per-generation aligned scans.
  */
final class GraftFileIndex(spark: SparkSession, table: GraftTable,
                           asOf: Option[graft.meta.Snapshot] = None)
  extends FileIndex {

  /** THE pinned snapshot — captured exactly once at construction (and
    * re-captured only by [[refresh]]), so every view of this index
    * derives from ONE snapshot: the file list, [[sizeInBytes]], the
    * [[metadataRowCount]] the count fold serves, and the stats-bearing
    * catalog table. Deriving any of them from `table.currentSnapshot`
    * at first-access time instead would let a DataFrame held across a
    * concurrent commit fold `count(*)` to the NEW snapshot's total
    * while its `collect()` scans the OLD pinned files — breaking the
    * snapshot isolation documented above (ADVICE r17). */
  @volatile private var pinnedSnap: Option[graft.meta.Snapshot] =
    asOf.orElse(table.currentSnapshot)

  /** (manifest parquet paths of the pinned snapshot, live (path, size)). */
  private var pinned: (Seq[String], Seq[(String, Long)]) = load()
  // listFiles can be re-entered during (re)planning of the same query
  // (AQE, multiple scan nodes over one relation) — memoize per filter
  // set so each distinct predicate pays the manifest job once.
  // Concurrent: two threads may plan queries over one shared DataFrame.
  private val listCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Long)]]

  private def load(): (Seq[String], Seq[(String, Long)]) = {
    val manifests = pinnedSnap.map(_.manifests).getOrElse(Seq.empty)
    val entries = manifestDf(manifests).select("path", "size_bytes")
      .collect().toIndexedSeq.map(r => (r.getString(0), r.getLong(1)))
    (manifests, entries)
  }

  private def manifestDf(paths: Seq[String]): DataFrame =
    graft.meta.ManifestIO.relation(spark, paths)

  override def rootPaths: Seq[Path] = Seq(new Path(table.location))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = pinned._2.map(_._2).sum

  /** Stats-bearing CatalogTable for [[GraftStatsRule]] — memoized per
    * pinned snapshot (the ANALYZE store and row count are read at the
    * same consistency as the file list; [[refresh]] invalidates). */
  private var catalogMemo
      : Option[Option[org.apache.spark.sql.catalyst.catalog.CatalogTable]] =
    None
  def catalogTableWithStats
      : Option[org.apache.spark.sql.catalyst.catalog.CatalogTable] =
    synchronized {
      catalogMemo.getOrElse {
        val ct = GraftStatsRule.catalogTableFor(table, pinnedSnap, sizeInBytes)
        catalogMemo = Some(ct)
        ct
      }
    }

  /** For [[GraftCountRule]]'s manifest-aggregate rewrite. */
  private[sources] def session: SparkSession = spark
  private[sources] def manifestPaths: Seq[String] = pinned._1
  private[sources] def snapshot: Option[graft.meta.Snapshot] = pinnedSnap

  /** The exact LOGICAL row count of the pinned snapshot, when a bare
    * unfiltered scan of this index returns exactly that many rows —
    * i.e. no outstanding merge-on-read delete files (with deletes, the
    * physical scan over-returns and [[GraftCountRule]] must not fire).
    * Snapshot `totalRows` is maintained by every commit. Reads the SAME
    * [[pinnedSnap]] the file list came from, so a count folded here can
    * never disagree with what a scan of this index would return. */
  def metadataRowCount: Option[Long] =
    pinnedSnap.collect {
      case s if s.deleteManifests.isEmpty && s.eqDeleteManifests.isEmpty =>
        s.totalRows
    }

  override def inputFiles: Array[String] = pinned._2.map(_._1).toArray

  override def refresh(): Unit = synchronized {
    // time travel pins the index to a named snapshot; refresh()
    // deliberately re-pins to the SAME one (an as-of read never moves)
    pinnedSnap = asOf.orElse(table.currentSnapshot)
    pinned = load()
    listCache.clear()
    catalogMemo = None
  }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val conds = dataFilters.flatMap(keepFile)
    val kept =
      if (conds.isEmpty) pinned._2
      else {
        val key = dataFilters.map(_.canonicalized.toString).sorted.mkString("&")
        listCache.computeIfAbsent(key, _ =>
          manifestDf(pinned._1).filter(conds.reduce(_ && _))
            .select("path", "size_bytes").collect().toIndexedSeq
            .map(r => (r.getString(0), r.getLong(1))))
      }
    val statuses = kept.map { case (p, sz) =>
      new FileStatus(sz, false, 1, 128L * 1024 * 1024, 0L, new Path(p)) }
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
  }

  // ---- predicate → manifest-column translation ---------------------------

  /** Translate a pushed predicate into a "this file might contain a
    * matching row" Column over manifest rows. None = not translatable
    * (keep every file — pruning is only ever a superset). Every produced
    * Column must evaluate TRUE when the needed statistic is missing. */
  private def keepFile(expr: Expression): Option[Column] = expr match {
    case And(l, r) => (keepFile(l), keepFile(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (a, b) => a.orElse(b) // one translatable conjunct still prunes
    }
    case Or(l, r) =>
      for { a <- keepFile(l); b <- keepFile(r) } yield a || b
    case EqualTo(a: AttributeReference, Literal(v, _)) => overlap(a, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => overlap(a, v)
    case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
      if (v == null) Some(mayHaveNulls(a)) else overlap(a, v)
    case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
      if (v == null) Some(mayHaveNulls(a)) else overlap(a, v)
    case GreaterThan(a: AttributeReference, Literal(v, _)) => maxAbove(a, v, strict = true)
    case LessThan(Literal(v, _), a: AttributeReference) => maxAbove(a, v, strict = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => maxAbove(a, v, strict = false)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) => maxAbove(a, v, strict = false)
    case LessThan(a: AttributeReference, Literal(v, _)) => minBelow(a, v, strict = true)
    case GreaterThan(Literal(v, _), a: AttributeReference) => minBelow(a, v, strict = true)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => minBelow(a, v, strict = false)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => minBelow(a, v, strict = false)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      anyOverlap(a, vs.collect { case Literal(v, _) if v != null => v })
    case InSet(a: AttributeReference, vs) =>
      anyOverlap(a, vs.toSeq.filter(_ != null))
    case IsNull(a: AttributeReference) => Some(mayHaveNulls(a))
    case IsNotNull(a: AttributeReference) => Some(mayHaveNonNulls(a))
    case Not(IsNull(a: AttributeReference)) => Some(mayHaveNonNulls(a))
    case Not(IsNotNull(a: AttributeReference)) => Some(mayHaveNulls(a))
    case Not(EqualTo(a: AttributeReference, Literal(v, _))) => notAllEqual(a, v)
    case Not(EqualTo(Literal(v, _), a: AttributeReference)) => notAllEqual(a, v)
    case StartsWith(a: AttributeReference, Literal(p, StringType)) if p != null =>
      Some(prefixOverlap(a, p.toString))
    case _ => None
  }

  private def minC(a: AttributeReference): Column =
    element_at(col("min_values"), a.name).cast(a.dataType)
  private def maxC(a: AttributeReference): Column =
    element_at(col("max_values"), a.name).cast(a.dataType)
  private def nullC(a: AttributeReference): Column =
    element_at(col("null_counts"), a.name)

  /** Catalyst-internal literal value → a Column literal of the column's
    * external type (None for nulls / non-boundable types → no pruning). */
  private def extLit(a: AttributeReference, v: Any): Option[Column] =
    if (v == null || !GraftTable.boundable(a.dataType)) None
    else Some(lit(CatalystTypeConverters.createToScalaConverter(a.dataType)(v))
      .cast(a.dataType))

  /** `a = v`: keep iff [min, max] covers v (missing bounds → keep) AND,
    * when the file carries a bloom filter for the column
    * (`write.bloom-filter.columns`), the bloom might contain v — the
    * point-lookup prune min/max can't provide on unsorted
    * high-cardinality columns (every file's range covers every probe;
    * the bloom says "definitely not here" per file). The probe hash is
    * computed at planning time from the same XxHash64 the write side
    * used. */
  private def overlap(a: AttributeReference, v: Any): Option[Column] =
    extLit(a, v).map { l =>
      val bounds =
        minC(a).isNull || maxC(a).isNull || (maxC(a) >= l && minC(a) <= l)
      val bloom = element_at(col("blooms"), a.name)
      val hash = org.apache.spark.sql.graft.CatalystShims
        .xxHash64Literal(v, a.dataType)
      // codegen'd per-row probe (BloomProbe expression) — a Scala UDF
      // here would break whole-stage codegen for the whole listFiles job
      bounds && org.apache.spark.sql.graft.CatalystShims.bloomProbe(bloom, hash)
    }

  private def anyOverlap(a: AttributeReference, vs: Seq[Any]): Option[Column] = {
    val opts = vs.map(v => overlap(a, v))
    if (vs.isEmpty || opts.exists(_.isEmpty)) None
    else Some(opts.flatten.reduce(_ || _))
  }

  /** `a > v` (strict) / `a >= v`: keep iff the file max clears v. */
  private def maxAbove(a: AttributeReference, v: Any,
                       strict: Boolean): Option[Column] =
    extLit(a, v).map(l =>
      maxC(a).isNull || (if (strict) maxC(a) > l else maxC(a) >= l))

  /** `a < v` (strict) / `a <= v`: keep iff the file min clears v. */
  private def minBelow(a: AttributeReference, v: Any,
                       strict: Boolean): Option[Column] =
    extLit(a, v).map(l =>
      minC(a).isNull || (if (strict) minC(a) < l else minC(a) <= l))

  /** `a IS NULL`: the manifest's null_counts says exactly — skip files
    * with zero nulls in the column (missing count → keep). */
  private def mayHaveNulls(a: AttributeReference): Column =
    nullC(a).isNull || nullC(a) > 0

  /** `a IS NOT NULL`: skip files where EVERY row is null in the column
    * (null_count == record_count — e.g. a pre-backfill append). */
  private def mayHaveNonNulls(a: AttributeReference): Column =
    nullC(a).isNull || nullC(a) < col("record_count")

  /** `NOT (a = v)`: skippable only when every non-null row equals v
    * (min == max == v); null rows never satisfy the predicate either. */
  private def notAllEqual(a: AttributeReference, v: Any): Option[Column] =
    extLit(a, v).map(l => coalesce(!(minC(a) === l && maxC(a) === l), lit(true)))

  /** `a LIKE 'p%'`: truncate the string bounds to the prefix length —
    * prefix-truncation is monotone under lexicographic order, so
    * prefix(min) <= p <= prefix(max) is a necessary condition. */
  private def prefixOverlap(a: AttributeReference, p: String): Column = {
    val mn = element_at(col("min_values"), a.name)
    val mx = element_at(col("max_values"), a.name)
    mn.isNull || mx.isNull ||
      (substring(mn, 1, p.length) <= p && substring(mx, 1, p.length) >= p)
  }
}
