HashAggregate
  Exchange
    HashAggregate
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Project
                  Filter
                    BroadcastHashJoin [broadcast,plain]
                      ColumnarToRow
                        Scan parquet 
                      Exchange
                        Project
                          Scan ExistingRDD
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
