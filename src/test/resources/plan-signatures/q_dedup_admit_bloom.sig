Union
  Project
    Filter
      Window
        WindowGroupLimit
          Sort
            Exchange
              WindowGroupLimit
                Sort
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
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
        Filter
          Window
            WindowGroupLimit
              Sort
                Exchange
                  WindowGroupLimit
                    Sort
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
