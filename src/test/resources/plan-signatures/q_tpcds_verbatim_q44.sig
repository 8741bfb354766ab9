TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.item
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
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
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
                                            Scan parquet spark_catalog.graft_tpcds_d13b5ee5edae3775.store_sales
