TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            Filter
              Window
                Filter
                  Window
                    Sort
                      Exchange
                        HashAggregate
                          Exchange
                            HashAggregate
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
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
          Project
            Window
              Sort
                Exchange
                  HashAggregate
                    Exchange
                      HashAggregate
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
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
                                    Filter
                                      ColumnarToRow
                                        Scan parquet 
      Project
        Window
          Sort
            Exchange
              HashAggregate
                Exchange
                  HashAggregate
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
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
