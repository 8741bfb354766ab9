Project
  Filter
    ColumnarToRow
      Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.reason
