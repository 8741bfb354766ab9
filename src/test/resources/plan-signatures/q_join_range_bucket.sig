HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          Project
            Filter
              ColumnarToRow
                Scan parquet 
          BroadcastExchange
            Generate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
