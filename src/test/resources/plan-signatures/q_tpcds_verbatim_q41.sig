TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
            Project
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
