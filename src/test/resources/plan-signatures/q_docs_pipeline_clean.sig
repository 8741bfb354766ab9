HashAggregate
  Exchange
    HashAggregate
      Project
        SortAggregate
          Sort
            Exchange
              SortAggregate
                Sort
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        ColumnarToRow
                          Scan parquet 
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          ObjectHashAggregate
                            Exchange
                              ObjectHashAggregate
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Project
                                      Filter
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
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    Project
                                                      Filter
                                                        Generate
                                                          Project
                                                            ColumnarToRow
                                                              Scan parquet 
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
