TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin
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
