TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
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
