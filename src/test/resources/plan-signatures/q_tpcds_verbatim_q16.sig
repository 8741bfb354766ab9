HashAggregate
  Exchange
    HashAggregate
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
                          Filter
                            Window
                              Sort
                                Exchange
                                  ColumnarToRow
                                    Scan parquet 
                        Project
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                                Project
                                  ColumnarToRow
                                    Scan parquet 
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
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
