TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    Union
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
      Filter
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    Union
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Filter
                                    ColumnarToRow
                                      Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
