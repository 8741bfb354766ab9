TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Exchange
                          Project
                            Filter
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
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                        Filter
                          ColumnarToRow
                            Scan parquet 
                    Project
                      Filter
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
                Project
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Project
                        Filter
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
                      Project
                        Filter
                          Window
                            Sort
                              Exchange
                                ColumnarToRow
                                  Scan parquet 
            Project
              Filter
                Window
                  Sort
                    Exchange
                      ColumnarToRow
                        Scan parquet 
