TakeOrderedAndProject
  Project
    HashAggregate
      Exchange
        HashAggregate
          Project
            BroadcastHashJoin [broadcast,plain]
              HashAggregate
                Exchange
                  HashAggregate
                    Filter
                      Generate
                        Filter
                          ColumnarToRow
                            Scan parquet 
              HashAggregate
                Exchange
                  HashAggregate
                    Filter
                      Generate
                        Filter
                          ColumnarToRow
                            Scan parquet 
