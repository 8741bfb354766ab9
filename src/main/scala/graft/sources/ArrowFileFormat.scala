package graft.sources

import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** `"arrow"` format alias.
  *
  * The reference registers an "arrow" DSv2 file source that reads
  * Parquet/Arrow files through the native Arrow Dataset library
  * (reference: arrow-data-source/standard/src/main/scala/com/intel/oap/spark/sql/
  * execution/datasources/v2/arrow/ArrowDataSourceV2.scala:27-41, shortName
  * "arrow"). Spark's own vectorized Parquet reader already delivers the
  * capability (columnar batches, predicate pushdown via ArrowFilters-
  * equivalent parquet filters, column pruning), so the alias simply mounts it
  * under the same format name. Since round 5 the "arrow" NAME resolves to
  * [[ArrowDataSource]] (DSv2, csv + parquet via `originalFormat`); this v1
  * class remains as its write-path fallback format.
  */
class ArrowFileFormat extends ParquetFileFormat {
  override def toString: String = "Arrow(alias of Parquet)"
}
