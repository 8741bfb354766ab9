Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
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
                                  HashAggregate
                                    Exchange
                                      HashAggregate
                                        Project
                                          BroadcastHashJoin [broadcast,plain]
                                            Filter
                                              SortAggregate
                                                Sort
                                                  Exchange
                                                    SortAggregate
                                                      Sort
                                                        Project
                                                          Project
                                                            BroadcastNestedLoopJoin [broadcast,plain]
                                                              Project
                                                                Filter
                                                                  ColumnarToRow
                                                                    Scan parquet 
                                                              Project
                                                                Generate
                                                                  Filter
                                                                    ColumnarToRow
                                                                      Scan parquet 
                                            Project
                                              BroadcastNestedLoopJoin [broadcast,plain]
                                                Project
                                                  Filter
                                                    ColumnarToRow
                                                      Scan parquet 
                                                Project
                                                  Generate
                                                    Filter
                                                      ColumnarToRow
                                                        Scan parquet 
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
