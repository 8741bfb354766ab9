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
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
