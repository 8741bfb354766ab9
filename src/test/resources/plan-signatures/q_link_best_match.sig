Project
  Filter
    Window
      Window
        Sort
          Exchange
            Project
              BroadcastHashJoin [broadcast,plain]
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
                Project
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
