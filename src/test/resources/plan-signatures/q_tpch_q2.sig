TakeOrderedAndProject
  Project
    BroadcastHashJoin
      BroadcastExchange
        Project
          Filter
            ColumnarToRow
              Scan parquet 
      Project
        BroadcastHashJoin
          BroadcastExchange
            Filter
              ColumnarToRow
                Scan parquet 
          Project
            BroadcastHashJoin
              BroadcastExchange
                Filter
                  ColumnarToRow
                    Scan parquet 
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
                              BroadcastExchange
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                              Project
                                BroadcastHashJoin
                                  BroadcastExchange
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                                  Project
                                    BroadcastHashJoin
                                      BroadcastExchange
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                      HashAggregate
                                        Exchange
                                          HashAggregate
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
