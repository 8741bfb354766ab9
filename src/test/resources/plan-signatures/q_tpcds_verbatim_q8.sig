HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          HashAggregate
            Exchange
              HashAggregate
                BroadcastHashJoin [broadcast,plain]
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                  Project
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
