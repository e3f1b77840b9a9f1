package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.GraftTable

/** Schema evolution: add / rename / drop / widen are metadata-only
  * commits; old data files keep resolving through stable field ids
  * (the Iceberg field-id contract — no data rewrite on rename). */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable() = {
    val t = GraftTable.create(spark, tmpDir("evolve") + "/t",
      spark.range(1).select(col("id"), lit("x").as("tag")).schema)
    t.append(spark.range(0, 100)
      .select(col("id"), concat(lit("v"), col("id")).as("tag")))
    t
  }

  test("addColumn null-fills old files; new appends carry values") {
    val t = freshTable()
    t.addColumn("score", DoubleType)
    assert(t.schema.fieldNames.toSeq == Seq("id", "tag", "score"))
    t.append(spark.range(100, 110)
      .select(col("id"), lit("new").as("tag"), lit(1.5).as("score")))
    assert(t.read.count() == 110)
    assert(t.read.filter(col("score").isNull).count() == 100)
    assert(t.read.filter(col("score") === 1.5).count() == 10)
  }

  test("renameColumn is metadata-only and old files resolve by field id") {
    val t = freshTable()
    val filesBefore = t.files.select("path").as[String].collect().toSet
    t.renameColumn("tag", "label")
    assert(t.files.select("path").as[String].collect().toSet == filesBefore,
      "no data file rewritten")
    assert(t.schema.fieldNames.toSeq == Seq("id", "label"))
    val r = t.read.filter(col("id") === 7).select("label").as[String].collect()
    assert(r.toSeq == Seq("v7"), "pre-rename data resolves under new name")
    // data written AFTER the rename joins seamlessly
    t.append(Seq((200L, "post")).toDF("id", "label"))
    assert(t.read.filter(col("label") === "post").count() == 1)
    assert(t.read.filter(col("label").startsWith("v")).count() == 100)
  }

  test("dropColumn stops projecting; add-back under same name is a NEW column") {
    val t = freshTable()
    t.dropColumn("tag")
    assert(t.schema.fieldNames.toSeq == Seq("id"))
    assert(t.read.columns.toSeq == Seq("id"))
    t.addColumn("tag", StringType)
    // old files' "tag" bytes must NOT resurrect under the re-added column
    assert(t.read.filter(col("tag").isNotNull).count() == 0)
  }

  test("partition-spec source columns cannot be renamed or dropped") {
    import graft.meta.PartitionSpec
    val t = GraftTable.create(spark, tmpDir("evolve") + "/t",
      spark.range(1).select(col("id"), lit("x").as("tag")).schema,
      partitionBy = Seq(PartitionSpec.bucket(4, "id")))
    t.append(spark.range(0, 10).select(col("id"), lit("v").as("tag")))
    intercept[IllegalArgumentException](t.renameColumn("id", "id2"))
    intercept[IllegalArgumentException](t.dropColumn("id"))
    t.renameColumn("tag", "label") // non-spec columns still evolve
    assert(t.schema.fieldNames.toSeq == Seq("id", "label"))
  }

  test("updateColumnType widens and refuses narrowing") {
    val t = GraftTable.create(spark, tmpDir("evolve") + "/t",
      StructType(Seq(StructField("k", IntegerType), StructField("v", FloatType))))
    t.append(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "v"))
    t.updateColumnType("k", LongType)
    t.updateColumnType("v", DoubleType)
    assert(t.schema("k").dataType == LongType)
    val rows = t.read.orderBy("k").as[(Long, Double)].collect()
    assert(rows.head == ((1L, 1.5)))
    intercept[IllegalArgumentException](t.updateColumnType("k", IntegerType))
    // Iceberg promotion only — Spark's canUpCast order would admit
    // these LOSSY conversions (2^60+1 as float, numbers as strings)
    intercept[IllegalArgumentException](t.updateColumnType("k", FloatType))
    intercept[IllegalArgumentException](t.updateColumnType("k", DoubleType))
    intercept[IllegalArgumentException](t.updateColumnType("k", StringType))
  }

  test("evolution composes with CoW merge and optimize") {
    val t = freshTable()
    t.renameColumn("tag", "label")
    t.addColumn("score", DoubleType)
    // merge against the evolved schema touches old-schema files
    t.merge(Seq((7L, "UP", 9.9)).toDF("id", "label", "score"), Seq("id"))
    val m = t.read.filter(col("id").isin(7L, 8L))
      .collect().map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(m(7L) == (("UP", Some(9.9))))
    assert(m(8L) == (("v8", None)), "untouched row in affected file aligned")
    // optimize rewrites everything into the current schema
    t.optimize()
    assert(t.schemaVersions.size == 3)
    assert(t.read.count() == 100)
    assert(t.read.filter(col("label") === "UP").count() == 1)
    // pruned read on an evolved table still works (superset guarantee)
    val scan = t.readPruned("id", lit(0L), lit(10L))
    assert(scan.df.filter(col("id") <= 10).count() == 11)
  }
}
