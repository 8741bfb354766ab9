Project
  BroadcastHashJoin [broadcast,plain]
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
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet 
                          Project
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
    Project
      Filter
        ColumnarToRow
          Scan parquet 
