TakeOrderedAndProject
  Project
    Window
      Sort
        Exchange
          HashAggregate
            Exchange
              HashAggregate
                Expand
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet spark_catalog.graft_tpcds_v.store
                        Project
                          Filter
                            Window
                              WindowGroupLimit
                                Sort
                                  HashAggregate
                                    Exchange
                                      HashAggregate
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              ColumnarToRow
                                                Scan parquet spark_catalog.graft_tpcds_v.store
                                            Project
                                              BroadcastHashJoin [broadcast,plain]
                                                Filter
                                                  ColumnarToRow
                                                    Scan parquet spark_catalog.graft_tpcds_v.store_sales
                                                Project
                                                  Filter
                                                    ColumnarToRow
                                                      Scan parquet spark_catalog.graft_tpcds_v.date_dim
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet spark_catalog.graft_tpcds_v.store_sales
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet spark_catalog.graft_tpcds_v.date_dim
