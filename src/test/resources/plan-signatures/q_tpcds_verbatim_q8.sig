HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          HashAggregate
            Exchange
              HashAggregate
                BroadcastHashJoin [broadcast,plain]
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
                  Project
                    Filter
                      HashAggregate
                        Exchange
                          HashAggregate
                            Project
                              BroadcastHashJoin [broadcast,plain]
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
                                Project
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
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
