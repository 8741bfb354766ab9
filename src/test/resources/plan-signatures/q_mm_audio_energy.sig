Project
  BroadcastHashJoin [broadcast,plain]
    HashAggregate
      Exchange
        HashAggregate
          Project
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    Generate
                      Project
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
                      Filter
                        HashAggregate
                          Exchange
                            HashAggregate
                              Project
                                Generate
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
