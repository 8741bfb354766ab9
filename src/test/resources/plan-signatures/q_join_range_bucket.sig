HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          BroadcastExchange
            Generate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
