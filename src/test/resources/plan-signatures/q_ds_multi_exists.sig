HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          BroadcastHashJoin
            Exchange
              BroadcastHashJoin
                ColumnarToRow
                  Scan parquet 
                BroadcastExchange
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
            BroadcastExchange
              Exchange
                Project
                  BroadcastHashJoin
                    Project
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
