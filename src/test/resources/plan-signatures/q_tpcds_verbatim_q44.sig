TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet spark_catalog.graft_tpcds_v.item
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_v.item
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                Filter
                  Window
                    WindowGroupLimit
                      Sort
                        Exchange
                          WindowGroupLimit
                            Sort
                              Filter
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_v.store_sales
              Project
                Filter
                  Window
                    WindowGroupLimit
                      Sort
                        Exchange
                          WindowGroupLimit
                            Sort
                              Filter
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet spark_catalog.graft_tpcds_v.store_sales
