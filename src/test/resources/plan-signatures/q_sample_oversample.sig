HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        HashAggregate
          Generate
            Project
              Filter
                BroadcastHashJoin [broadcast,plain]
                  Exchange
                    Union
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
                          Project
                            Filter
                              InMemoryTableScan
                      Project
                        Filter
                          Window
                            Sort
                              Exchange
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      InMemoryTableScan
                                    Project
                                      Project
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
                          HashAggregate
                            Exchange
                              HashAggregate
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                          Project
                            HashAggregate
                              Exchange
                                HashAggregate
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
