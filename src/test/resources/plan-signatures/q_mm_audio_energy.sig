Project
  BroadcastHashJoin [broadcast,plain]
    HashAggregate
      HashAggregate
        HashAggregate
          HashAggregate
            Project
              Window
                Sort
                  Project
                    Filter
                      HashAggregate
                        HashAggregate
                          Project
                            Generate
                              Project
                                Exchange
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
    HashAggregate
      HashAggregate
        Project
          HashAggregate
            HashAggregate
              Project
                Generate
                  Project
                    Exchange
                      Filter
                        ColumnarToRow
                          Scan parquet 
