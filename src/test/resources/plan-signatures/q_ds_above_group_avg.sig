HashAggregate
  HashAggregate
    Project
      BroadcastHashJoin
        BroadcastExchange
          Project
            BroadcastHashJoin
              BroadcastExchange
                HashAggregate
                  Exchange
                    HashAggregate
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin
                                BroadcastExchange
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
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
                            Filter
                              ColumnarToRow
                                Scan parquet 
                          Filter
                            ColumnarToRow
                              Scan parquet 
        Filter
          HashAggregate
            Exchange
              HashAggregate
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        BroadcastHashJoin
                          BroadcastExchange
                            Filter
                              ColumnarToRow
                                Scan parquet 
                          Filter
                            ColumnarToRow
                              Scan parquet 
