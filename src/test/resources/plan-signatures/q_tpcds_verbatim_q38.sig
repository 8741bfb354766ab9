HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          BroadcastHashJoin [broadcast,plain]
            Exchange
              HashAggregate
                HashAggregate
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
                        Project
                          Filter
                            Window
                              Sort
                                Exchange
                                  ColumnarToRow
                                    Scan parquet 
            HashAggregate
              HashAggregate
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
                      Project
                        Filter
                          Window
                            Sort
                              Exchange
                                ColumnarToRow
                                  Scan parquet 
          Exchange
            HashAggregate
              HashAggregate
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
                      Project
                        Filter
                          Window
                            Sort
                              Exchange
                                ColumnarToRow
                                  Scan parquet 
