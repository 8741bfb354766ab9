TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  Project
                    Filter
                      BroadcastHashJoin [broadcast,plain]
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
                          Exchange
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
                        Exchange
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
                        TakeOrderedAndProject
                          ColumnarToRow
                            Scan parquet 
            Project
              Filter
                Window
                  TakeOrderedAndProject
                    ColumnarToRow
                      Scan parquet 
