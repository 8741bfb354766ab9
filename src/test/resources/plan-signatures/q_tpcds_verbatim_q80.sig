TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Expand
          Union
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_returns
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.promotion
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_page
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_returns
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.catalog_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.promotion
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_site
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Project
                                BroadcastHashJoin [broadcast,plain]
                                  Project
                                    BroadcastHashJoin [broadcast,plain]
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_returns
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.web_sales
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.date_dim
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.promotion
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
