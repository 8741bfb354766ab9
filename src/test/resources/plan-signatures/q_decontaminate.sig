Project
  BroadcastHashJoin [broadcast,plain]
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            Exchange
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Project
                          Filter
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Generate
                                    Project
                                      Filter
                                        ColumnarToRow
                                          Scan parquet 
                        Project
                          Generate
                            Filter
                              ColumnarToRow
                                Scan parquet 
                    Project
                      Generate
                        Filter
                          ColumnarToRow
                            Scan parquet 
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            HashAggregate
              Project
                BroadcastHashJoin [broadcast,plain]
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Generate
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
                      Project
                        Filter
                          HashAggregate
                            Exchange
                              HashAggregate
                                Generate
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                  Project
                    Generate
                      Filter
                        ColumnarToRow
                          Scan parquet 
