TakeOrderedAndProject
  Project
    BroadcastHashJoin
      Project
        BroadcastHashJoin
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Filter
                    ColumnarToRow
                      Scan parquet 
          BroadcastExchange
            Filter
              ColumnarToRow
                Scan parquet 
      BroadcastExchange
        Filter
          ColumnarToRow
            Scan parquet 
