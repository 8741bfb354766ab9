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
                            Filter
                              ColumnarToRow
                                Scan parquet 
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
