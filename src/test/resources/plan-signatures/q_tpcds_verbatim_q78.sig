TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        HashAggregate
          Exchange
            HashAggregate
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    Filter
                      BroadcastHashJoin [broadcast,plain]
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
                        Project
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
        BroadcastHashJoin [broadcast,plain]
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Project
                        Filter
                          BroadcastHashJoin [broadcast,plain]
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                            Project
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
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      Filter
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
                          Project
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
