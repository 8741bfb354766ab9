HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
