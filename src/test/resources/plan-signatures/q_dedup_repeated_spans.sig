Project
  BroadcastHashJoin [broadcast,plain]
    HashAggregate
      Exchange
        HashAggregate
          Project
            Generate
              Filter
                ColumnarToRow
                  Scan parquet 
    HashAggregate
      HashAggregate
        HashAggregate
          HashAggregate
            Project
              Window
                Sort
                  Exchange
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Project
                          Filter
                            Generate
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
                                              Filter
                                                ColumnarToRow
                                                  Scan parquet 
