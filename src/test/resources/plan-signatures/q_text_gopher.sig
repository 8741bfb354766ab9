HashAggregate
  Exchange
    HashAggregate
      Project
        Project
          BroadcastHashJoin [broadcast,plain]
            HashAggregate
              Exchange
                HashAggregate
                  HashAggregate
                    Exchange
                      HashAggregate
                        Generate
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
            Project
              Project
                Project
                  ColumnarToRow
                    Scan parquet 
