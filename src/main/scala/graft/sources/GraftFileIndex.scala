package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.meta.GraftTable

/** A Catalyst [[FileIndex]] over the graft manifest — the integration
  * point that makes file skipping AUTOMATIC: any `WHERE` predicate a
  * query pushes into the scan is tested against each data file's
  * manifest min/max bounds, and non-overlapping files are never listed
  * to the parquet reader. This is the same architecture Delta Lake's
  * TahoeFileIndex and Iceberg's SparkScan use — the table format owns
  * file listing, Catalyst owns everything else (the parquet row-group
  * pruning below us still applies to the files we do list).
  *
  * Scale: listing is driven by the manifest (one small parquet per
  * commit chain), never a recursive storage listing — on object stores
  * at 100 TB that is the difference between one metadata read and a
  * million LIST calls. Unknown or non-comparison predicates keep the
  * file (superset guarantee; the row filter still runs).
  *
  * Evolution note: this path serves tables whose schema never evolved
  * (one schema generation). [[GraftTable.read]] handles evolved tables
  * via per-generation aligned scans.
  */
final class GraftFileIndex(spark: SparkSession, table: GraftTable)
  extends FileIndex {

  private case class FileEntry(path: String, size: Long,
                               mins: Map[String, String],
                               maxs: Map[String, String])

  private var entries: Seq[FileEntry] = loadEntries()

  private def loadEntries(): Seq[FileEntry] =
    table.files.select("path", "size_bytes", "min_values", "max_values")
      .collect().toIndexedSeq.map { r =>
        def m(i: Int): Map[String, String] =
          if (r.isNullAt(i)) Map.empty
          else r.getMap[String, String](i).toMap
        FileEntry(r.getString(0), r.getLong(1), m(2), m(3))
      }

  override def rootPaths: Seq[Path] = Seq(new Path(table.location))

  override def partitionSchema: StructType = new StructType()

  override def sizeInBytes: Long = entries.map(_.size).sum

  override def inputFiles: Array[String] = entries.map(_.path).toArray

  override def refresh(): Unit = { entries = loadEntries() }

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = entries.filter(e => dataFilters.forall(f => mayMatch(e, f)))
    val statuses = kept.map(e =>
      new FileStatus(e.size, false, 1, 128L * 1024 * 1024, 0L, new Path(e.path)))
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))
  }

  // ---- bounds algebra ----------------------------------------------------

  /** Conservative "file might contain a matching row" test. Any shape we
    * don't understand returns true — pruning is only ever a superset. */
  private def mayMatch(e: FileEntry, expr: Expression): Boolean = expr match {
    case And(l, r) => mayMatch(e, l) && mayMatch(e, r)
    case Or(l, r)  => mayMatch(e, l) || mayMatch(e, r)
    case EqualTo(a: AttributeReference, Literal(v, _)) => overlaps(e, a, v, v)
    case EqualTo(Literal(v, _), a: AttributeReference) => overlaps(e, a, v, v)
    case GreaterThan(a: AttributeReference, Literal(v, _)) =>
      boundCmp(e, a, v)(GreaterThan(_, _), useMax = true)
    case LessThan(Literal(v, _), a: AttributeReference) =>
      boundCmp(e, a, v)(GreaterThan(_, _), useMax = true)
    case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      boundCmp(e, a, v)(GreaterThanOrEqual(_, _), useMax = true)
    case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
      boundCmp(e, a, v)(GreaterThanOrEqual(_, _), useMax = true)
    case LessThan(a: AttributeReference, Literal(v, _)) =>
      boundCmp(e, a, v)(LessThan(_, _), useMax = false)
    case GreaterThan(Literal(v, _), a: AttributeReference) =>
      boundCmp(e, a, v)(LessThan(_, _), useMax = false)
    case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
      boundCmp(e, a, v)(LessThanOrEqual(_, _), useMax = false)
    case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
      boundCmp(e, a, v)(LessThanOrEqual(_, _), useMax = false)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists { case Literal(v, _) => overlaps(e, a, v, v) }
    case InSet(a: AttributeReference, vs) =>
      vs.exists(v => overlaps(e, a, v, v))
    case _ => true
  }

  /** Does [lo, hi] (internal-format values of the attribute's type)
    * intersect the file's recorded [min, max] for this column? */
  private def overlaps(e: FileEntry, a: AttributeReference,
                       lo: Any, hi: Any): Boolean =
    (for { mn <- parsedBound(e.mins, a); mx <- parsedBound(e.maxs, a) } yield
      evalB(LessThanOrEqual(Literal(lo, a.dataType), Literal(mx, a.dataType))) &&
      evalB(GreaterThanOrEqual(Literal(hi, a.dataType), Literal(mn, a.dataType)))
    ).getOrElse(true) // no bounds recorded → keep

  /** Test `op(bound, v)` against the file's max (or min) for the column
    * — e.g. `x > v` keeps the file iff `max(x) > v`. */
  private def boundCmp(e: FileEntry, a: AttributeReference, v: Any)
                      (op: (Expression, Expression) => Expression,
                       useMax: Boolean): Boolean =
    parsedBound(if (useMax) e.maxs else e.mins, a)
      .map(b => evalB(op(Literal(b, a.dataType), Literal(v, a.dataType))))
      .getOrElse(true)

  /** Decode the string-encoded manifest bound back to the column's type
    * (internal format), via the same Cast the write used in reverse. */
  private def parsedBound(m: Map[String, String],
                          a: AttributeReference): Option[Any] =
    m.get(a.name).flatMap { s =>
      Option(Cast(Literal(UTF8String.fromString(s), StringType), a.dataType,
        Some("UTC")).eval(null))
    }

  private def evalB(e: Expression): Boolean =
    e.eval(null) match { case b: Boolean => b; case _ => true }
}
