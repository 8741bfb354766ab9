HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          BroadcastExchange
            Filter
              HashAggregate
                Exchange
                  HashAggregate
                    Filter
                      ColumnarToRow
                        Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
