package graft.sources

import java.util.Locale

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.csv.CSVFileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.csv.CSVTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `"arrow"` DataSource V2 — the format-name surface of the reference's
  * ArrowDataSourceV2 (arrow-data-source/standard/.../ArrowDataSourceV2
  * .scala:27-41), `originalFormat` option included: the reference's Arrow
  * Dataset scanner reads parquet (default) or csv
  * (ArrowUtils.scala:117-118), so this alias dispatches the same option to
  * Spark's own vectorized parquet / csv tables. Reads plan as v2
  * BatchScanExec with full pushdown/pruning; writes fall back to the v1
  * [[ArrowFileFormat]] (a parquet alias, matching the reference's
  * parquet-only write path). */
class ArrowDataSource extends FileDataSourceV2 {

  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[ArrowFileFormat]

  override def shortName(): String = "arrow"

  private def originalFormat(options: CaseInsensitiveStringMap): String =
    Option(options.get("originalFormat"))
      .getOrElse("parquet").toLowerCase(Locale.ROOT)

  private def table(options: CaseInsensitiveStringMap,
      schema: Option[StructType]): Table = {
    val paths = getPaths(options)
    val name = getTableName(options, paths)
    val opts = getOptionsWithoutPaths(options)
    originalFormat(options) match {
      case "parquet" =>
        ParquetTable(name, sparkSession, opts, paths, schema,
          classOf[ParquetFileFormat])
      case "csv" =>
        CSVTable(name, sparkSession, opts, paths, schema,
          classOf[CSVFileFormat])
      case other => throw new IllegalArgumentException(
        s"arrow source: originalFormat must be 'parquet' or 'csv', " +
          s"got '$other' (the reference's Arrow Dataset reader supports " +
          "exactly these two)")
    }
  }

  override def getTable(options: CaseInsensitiveStringMap): Table =
    table(options, None)

  override def getTable(options: CaseInsensitiveStringMap,
      schema: StructType): Table = table(options, Some(schema))
}
