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
                      BroadcastHashJoin
                        BroadcastExchange
                          ColumnarToRow
                            Scan parquet 
                        Filter
                          ColumnarToRow
                            Scan parquet 
