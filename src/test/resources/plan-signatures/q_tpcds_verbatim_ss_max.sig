HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
