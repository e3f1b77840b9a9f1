package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

import graft.meta.GraftTable

/** `spark.read.format("graft").load(path)` — the graft table format as
  * a registered Spark data source (META-INF/services). The relation is
  * a plain HadoopFsRelation whose file listing comes from
  * [[GraftFileIndex]], so snapshot isolation (only current-snapshot
  * files are listed) and manifest-bounds file skipping apply to any SQL
  * or DataFrame query with zero graft-specific code at the call site;
  * Catalyst's parquet pushdown and column pruning compose below it. */
final class DefaultSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft source requires a path"))
    val spark = sqlContext.sparkSession
    val table = GraftTable.load(spark, path)
    require(GraftTable.exists(spark, path), s"no graft table at $path")
    require(table.schemaVersions.size <= 1,
      "the graft DataSource serves un-evolved tables; use GraftTable.read " +
        "for schema-evolved tables (per-generation aligned scans)")
    HadoopFsRelation(
      location = new GraftFileIndex(spark, table),
      partitionSchema = new org.apache.spark.sql.types.StructType(),
      dataSchema = table.schema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
  }
}
