HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        HashAggregate
          Project
            Window
              Sort
                Window
                  Sort
                    Exchange
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            Generate
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
