TakeOrderedAndProject
  Filter
    Window
      Sort
        Exchange
          Project
            SortMergeJoin [plain,plain]
              Sort
                Exchange
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
                                        Scan parquet spark_catalog.graft_tpcds_v.store_sales
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_v.date_dim
              Sort
                Exchange
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
                                        Scan parquet spark_catalog.graft_tpcds_v.web_sales
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet spark_catalog.graft_tpcds_v.date_dim
