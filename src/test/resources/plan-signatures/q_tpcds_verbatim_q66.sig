TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Union
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
