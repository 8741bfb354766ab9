HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Exchange
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
                          ColumnarToRow
                            Scan parquet 
          Project
            Filter
              BroadcastHashJoin [broadcast,plain]
                Exchange
                  Project
                    Scan ExistingRDD
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
                              ColumnarToRow
                                Scan parquet 
