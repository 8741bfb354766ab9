HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          Project
            BroadcastHashJoin
              Project
                BroadcastHashJoin
                  Project
                    BroadcastHashJoin
                      Project
                        BroadcastHashJoin
                          BroadcastExchange
                            Filter
                              ColumnarToRow
                                Scan parquet 
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
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
          BroadcastExchange
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
