Sort
  Exchange
    Project
      Filter
        HashAggregate
          Exchange
            HashAggregate
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
                          Filter
                            ColumnarToRow
                              Scan parquet 
