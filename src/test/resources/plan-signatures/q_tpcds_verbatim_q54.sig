HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      ColumnarToRow
                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                Project
                  BroadcastHashJoin [broadcast,plain]
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                                      Union
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.customer_address
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
