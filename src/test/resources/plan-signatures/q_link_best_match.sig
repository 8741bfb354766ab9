Project
  Filter
    Window
      Window
        Sort
          Exchange
            HashAggregate
              HashAggregate
                Project
                  BroadcastHashJoin [broadcast,plain]
                    HashAggregate
                      Exchange
                        HashAggregate
                          Project
                            Filter
                              Generate
                                Project
                                  Filter
                                    Generate
                                      Generate
                                        Project
                                          Project
                                            Filter
                                              ColumnarToRow
                                                Scan parquet 
                    Project
                      Filter
                        Generate
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
