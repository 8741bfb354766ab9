TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            Filter
              Window
                Filter
                  Window
                    Sort
                      Exchange
                        HashAggregate
                          Exchange
                            HashAggregate
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                                      Project
                                        BroadcastHashJoin [broadcast,plain]
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                          Filter
                                            ColumnarToRow
                                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
          Project
            Window
              Sort
                Exchange
                  HashAggregate
                    Exchange
                      HashAggregate
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
      Project
        Window
          Sort
            Exchange
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
