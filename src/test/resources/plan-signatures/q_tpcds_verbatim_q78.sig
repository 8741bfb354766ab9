TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
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
                    Filter
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet 
                        Filter
                          ColumnarToRow
                            Scan parquet 
      Project
        BroadcastHashJoin [broadcast,plain]
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
                        Filter
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet 
                            Filter
                              ColumnarToRow
                                Scan parquet 
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
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet 
                          Filter
                            ColumnarToRow
                              Scan parquet 
