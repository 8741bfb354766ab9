Project
  Filter
    ColumnarToRow
      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.reason
