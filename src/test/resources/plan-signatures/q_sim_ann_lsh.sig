Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Exchange
            WindowGroupLimit
              Sort
                SortAggregate
                  Sort
                    Exchange
                      SortAggregate
                        Sort
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                Generate
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                              Filter
                                Generate
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
