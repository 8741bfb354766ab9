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
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                                    Project
                                      Filter
                                        Window
                                          Sort
                                            Exchange
                                              ColumnarToRow
                                                Scan parquet 
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
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                                    Project
                                      Filter
                                        Window
                                          Sort
                                            Exchange
                                              ColumnarToRow
                                                Scan parquet 
