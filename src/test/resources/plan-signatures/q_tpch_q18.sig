TakeOrderedAndProject
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
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Filter
                    ColumnarToRow
                      Scan parquet 
