Project
  Filter
    Window
      WindowGroupLimit
        Sort
          Exchange
            WindowGroupLimit
              Sort
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
                    HashAggregate
                      Exchange
                        HashAggregate
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
