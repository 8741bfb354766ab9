Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Exchange
            WindowGroupLimit
              Sort
                Project
                  BroadcastHashJoin
                    BroadcastExchange
                      Project
                        Filter
                          Window
                            WindowGroupLimit
                              Sort
                                Exchange
                                  WindowGroupLimit
                                    Sort
                                      Project
                                        BroadcastNestedLoopJoin
                                          BroadcastExchange
                                            Project
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet 
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                    Project
                      BroadcastHashJoin
                        BroadcastExchange
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
                        Filter
                          SortAggregate
                            Sort
                              Exchange
                                SortAggregate
                                  Sort
                                    Project
                                      BroadcastNestedLoopJoin
                                        BroadcastExchange
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
