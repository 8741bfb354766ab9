TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.item
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
                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
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
                                            Scan parquet spark_catalog.graft_tpcds_2e56eb452c133e88.store_sales
