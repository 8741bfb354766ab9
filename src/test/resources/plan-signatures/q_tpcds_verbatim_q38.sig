HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          BroadcastHashJoin [broadcast,plain]
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
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            ColumnarToRow
                              Scan parquet 
                          Project
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
                      BroadcastHashJoin [broadcast,plain]
                        Filter
                          ColumnarToRow
                            Scan parquet 
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
