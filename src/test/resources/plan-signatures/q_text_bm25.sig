TakeOrderedAndProject
  Project
    BroadcastNestedLoopJoin
      BroadcastNestedLoopJoin
        Project
          BroadcastHashJoin
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
            BroadcastExchange
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
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
      BroadcastExchange
        HashAggregate
          Exchange
            HashAggregate
              Project
                ColumnarToRow
                  Scan parquet 
