Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Exchange
            WindowGroupLimit
              Sort
                Project
                  BroadcastNestedLoopJoin [broadcast,plain]
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
