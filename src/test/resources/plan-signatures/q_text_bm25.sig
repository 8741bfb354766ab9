TakeOrderedAndProject
  Project
    BroadcastNestedLoopJoin
      BroadcastExchange
        HashAggregate
          Exchange
            HashAggregate
              Project
                ColumnarToRow
                  Scan parquet 
      BroadcastNestedLoopJoin
        BroadcastExchange
          HashAggregate
            Exchange
              HashAggregate
                HashAggregate
                  Exchange
                    HashAggregate
                      HashAggregate
                        Exchange
                          HashAggregate
                            Filter
                              Generate
                                ColumnarToRow
                                  Scan parquet 
        Project
          BroadcastHashJoin
            BroadcastExchange
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
            HashAggregate
              Exchange
                HashAggregate
                  HashAggregate
                    Exchange
                      HashAggregate
                        Filter
                          Generate
                            Filter
                              ColumnarToRow
                                Scan parquet 
