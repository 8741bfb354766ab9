Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Exchange
            WindowGroupLimit
              Sort
                Project
                  BroadcastNestedLoopJoin
                    BroadcastExchange
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
