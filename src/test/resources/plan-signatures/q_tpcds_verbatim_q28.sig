BroadcastNestedLoopJoin [broadcast,plain]
  BroadcastNestedLoopJoin [broadcast,plain]
    BroadcastNestedLoopJoin [broadcast,plain]
      BroadcastNestedLoopJoin [broadcast,plain]
        BroadcastNestedLoopJoin [broadcast,plain]
          HashAggregate
            Exchange
              HashAggregate
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_v.store_sales
          HashAggregate
            Exchange
              HashAggregate
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_v.store_sales
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_v.store_sales
      HashAggregate
        Exchange
          HashAggregate
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_v.store_sales
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            Exchange
              HashAggregate
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_v.store_sales
  HashAggregate
    Exchange
      HashAggregate
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet spark_catalog.graft_tpcds_v.store_sales
