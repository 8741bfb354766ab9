HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          HashAggregate
            HashAggregate
              SortMergeJoin [plain,plain]
                Sort
                  Project
                    Filter
                      HashAggregate
                        HashAggregate
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Project
                                Filter
                                  Window
                                    Sort
                                      Exchange
                                        ColumnarToRow
                                          Scan parquet 
                              Project
                                Project
                                  Filter
                                    Window
                                      TakeOrderedAndProject
                                        ColumnarToRow
                                          Scan parquet 
                Sort
                  Project
                    Project
                      Filter
                        Window
                          TakeOrderedAndProject
                            ColumnarToRow
                              Scan parquet 
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
                        Sort
                          Exchange
                            ColumnarToRow
                              Scan parquet 
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
