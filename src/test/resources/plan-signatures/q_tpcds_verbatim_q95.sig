HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                BroadcastHashJoin [broadcast,plain]
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
                          BroadcastHashJoin [broadcast,plain]
                            BroadcastHashJoin [broadcast,plain]
                              Exchange
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                            Exchange
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
                                          ColumnarToRow
                                            Scan parquet 
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                  Project
                    Filter
                      Window
                        TakeOrderedAndProject
                          ColumnarToRow
                            Scan parquet 
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
