TakeOrderedAndProject
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
                        BroadcastNestedLoopJoin [broadcast,plain]
                          HashAggregate
                            Exchange
                              HashAggregate
                                ColumnarToRow
                                  Scan parquet 
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  ColumnarToRow
                                    Scan parquet 
                      Project
                        Generate
                          Project
                            ColumnarToRow
                              Scan parquet 
