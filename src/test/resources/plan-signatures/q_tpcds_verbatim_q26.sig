TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Project
                          Filter
                            Window
                              TakeOrderedAndProject
                                ColumnarToRow
                                  Scan parquet 
                        Project
                          Project
                            Filter
                              ColumnarToRow
                                Scan parquet 
                    Project
                      Filter
                        Window
                          Sort
                            Exchange
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
