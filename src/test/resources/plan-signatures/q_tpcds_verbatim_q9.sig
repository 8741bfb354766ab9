Project
  Filter
    ColumnarToRow
      Scan parquet spark_catalog.graft_tpcds_v.reason
