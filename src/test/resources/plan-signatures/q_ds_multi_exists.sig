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
          BroadcastHashJoin
            BroadcastExchange
              Exchange
                Project
                  BroadcastHashJoin
                    BroadcastExchange
                      Filter
                        ColumnarToRow
                          Scan parquet 
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
            Exchange
              BroadcastHashJoin
                BroadcastExchange
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
                ColumnarToRow
                  Scan parquet 
