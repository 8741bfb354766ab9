HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  Filter
                    Generate
                      Project
                        Filter
                          Generate
                            Generate
                              Project
                                Project
                                  Project
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                Project
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
