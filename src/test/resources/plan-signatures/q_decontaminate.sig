Project
  BroadcastHashJoin
    BroadcastExchange
      HashAggregate
        Exchange
          HashAggregate
            HashAggregate
              HashAggregate
                Project
                  BroadcastHashJoin
                    BroadcastExchange
                      Project
                        Generate
                          Filter
                            ColumnarToRow
                              Scan parquet 
                    Project
                      BroadcastHashJoin
                        BroadcastExchange
                          Generate
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                        Project
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Generate
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
                Project
                  BroadcastHashJoin
                    BroadcastExchange
                      Project
                        Generate
                          Filter
                            ColumnarToRow
                              Scan parquet 
                    Project
                      BroadcastHashJoin
                        BroadcastExchange
                          Project
                            Generate
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                        Project
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Generate
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
