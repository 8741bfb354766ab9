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
                    Filter
                      ColumnarToRow
                        Scan parquet 
                Project
                  BroadcastHashJoin
                    BroadcastExchange
                      ColumnarToRow
                        Scan parquet 
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
