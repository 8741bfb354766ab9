TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  ColumnarToRow
                    Scan parquet 
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
