TakeOrderedAndProject
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
                  Filter
                    BroadcastHashJoin [broadcast,plain]
                      BroadcastHashJoin [broadcast,plain]
                        BroadcastHashJoin [broadcast,plain]
                          Exchange
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                                Project
                                  Filter
                                    ColumnarToRow
                                      Scan parquet 
                          Filter
                            ColumnarToRow
                              Scan parquet 
                        Exchange
                          Project
                            BroadcastHashJoin [broadcast,plain]
                              Filter
                                ColumnarToRow
                                  Scan parquet 
                              Project
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                      Exchange
                        Project
                          BroadcastHashJoin [broadcast,plain]
                            Filter
                              ColumnarToRow
                                Scan parquet 
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
