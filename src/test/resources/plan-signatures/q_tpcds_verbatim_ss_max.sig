HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_836d060148ea3130.store_sales
