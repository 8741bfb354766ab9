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
                                        Scan parquet 
                                    Project
                                      Filter
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
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
