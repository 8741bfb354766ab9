TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet 
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet 
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
