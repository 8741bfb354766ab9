Project
  BroadcastHashJoin [broadcast,plain]
    Filter
      InMemoryTableScan
    HashAggregate
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
                  Project
                    BroadcastHashJoin [broadcast,plain]
                      Filter
                        InMemoryTableScan
                      Project
                        Project
                          Filter
                            ColumnarToRow
                              Scan parquet 
