TakeOrderedAndProject
  Project
    BroadcastHashJoin
      Project
        BroadcastHashJoin
          Project
            BroadcastHashJoin
              Project
                BroadcastHashJoin
                  BroadcastExchange
                    Exchange
                      Project
                        BroadcastHashJoin
                          BroadcastExchange
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                  Filter
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            BroadcastHashJoin
                              Project
                                BroadcastHashJoin
                                  Project
                                    BroadcastHashJoin
                                      HashAggregate
                                        ReusedExchange
                                      BroadcastExchange
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                  BroadcastExchange
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                              BroadcastExchange
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
              BroadcastExchange
                Filter
                  ColumnarToRow
                    Scan parquet 
          BroadcastExchange
            Filter
              ColumnarToRow
                Scan parquet 
      ReusedExchange
