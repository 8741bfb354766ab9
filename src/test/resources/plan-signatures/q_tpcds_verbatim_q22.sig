TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Expand
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet 
              Project
                BroadcastHashJoin [broadcast,plain]
                  Filter
                    ColumnarToRow
                      Scan parquet 
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet 
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
