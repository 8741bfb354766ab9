HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            Project
              Filter
                Generate
                  BroadcastNestedLoopJoin [broadcast,plain]
                    ColumnarToRow
                      Scan parquet 
                    HashAggregate
                      Exchange
                        HashAggregate
                          ColumnarToRow
                            Scan parquet 
