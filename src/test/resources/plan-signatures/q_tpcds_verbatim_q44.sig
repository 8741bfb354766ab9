TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            BroadcastHashJoin [broadcast,plain]
              Project
                Filter
                  Window
                    WindowGroupLimit
                      Sort
                        Exchange
                          WindowGroupLimit
                            Sort
                              Filter
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
              Project
                Filter
                  Window
                    WindowGroupLimit
                      Sort
                        Exchange
                          WindowGroupLimit
                            Sort
                              Filter
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      Project
                                        Filter
                                          ColumnarToRow
                                            Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
      Project
        Filter
          ColumnarToRow
            Scan parquet 
