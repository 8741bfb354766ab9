TakeOrderedAndProject
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
                      Expand
                        Project
                          BroadcastHashJoin [broadcast,plain]
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
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
