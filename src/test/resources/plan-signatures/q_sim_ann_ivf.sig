Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Exchange
            WindowGroupLimit
              Sort
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          SortAggregate
                            Sort
                              Exchange
                                SortAggregate
                                  Sort
                                    Project
                                      BroadcastNestedLoopJoin [broadcast,plain]
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
                    Project
                      Filter
                        Window
                          WindowGroupLimit
                            Sort
                              Exchange
                                WindowGroupLimit
                                  Sort
                                    Project
                                      BroadcastNestedLoopJoin [broadcast,plain]
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                                        Project
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
