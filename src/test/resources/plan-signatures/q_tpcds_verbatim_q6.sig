TakeOrderedAndProject
  Filter
    HashAggregate
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  ColumnarToRow
                    Scan parquet 
                Filter
                  HashAggregate
                    Exchange
                      HashAggregate
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Project
                      BroadcastHashJoin [broadcast,plain]
                        Project
                          Project
                            Filter
                              Window
                                Sort
                                  Exchange
                                    ColumnarToRow
                                      Scan parquet 
                        Project
                          Project
                            Filter
                              Window
                                TakeOrderedAndProject
                                  ColumnarToRow
                                    Scan parquet 
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
