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
                      BroadcastExchange
                        Filter
                          ColumnarToRow
                            Scan parquet 
                      BroadcastHashJoin
                        Filter
                          ColumnarToRow
                            Scan parquet 
                        BroadcastExchange
                          ColumnarToRow
                            Scan parquet 
                  BroadcastExchange
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
              BroadcastExchange
                ColumnarToRow
                  Scan parquet 
          BroadcastExchange
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
