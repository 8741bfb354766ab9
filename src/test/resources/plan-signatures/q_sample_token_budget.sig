Project
  BroadcastHashJoin [broadcast,plain]
    HashAggregate
      Exchange
        HashAggregate
          Union
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
                Project
                  Filter
                    InMemoryTableScan
            Project
              Filter
                Window
                  Sort
                    Exchange
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            InMemoryTableScan
                          Project
                            Project
                              Filter
                                ColumnarToRow
                                  Scan parquet 
    Project
      HashAggregate
        Exchange
          HashAggregate
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
