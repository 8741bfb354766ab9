HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            BroadcastNestedLoopJoin [broadcast,plain]
              Filter
                Window
                  Sort
                    Exchange
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              ColumnarToRow
                                Scan parquet 
              HashAggregate
                Exchange
                  HashAggregate
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            ColumnarToRow
                              Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
