Project
  BroadcastHashJoin [broadcast,plain]
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            Exchange
              HashAggregate
                Project
                  Generate
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
    Project
      BroadcastHashJoin [broadcast,plain]
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    Generate
                      Filter
                        ColumnarToRow
                          Scan parquet 
        HashAggregate
          Exchange
            HashAggregate
              Project
                BroadcastHashJoin [broadcast,plain]
                  HashAggregate
                    Exchange
                      HashAggregate
                        Generate
                          Filter
                            ColumnarToRow
                              Scan parquet 
                  HashAggregate
                    Exchange
                      HashAggregate
                        HashAggregate
                          Exchange
                            HashAggregate
                              Generate
                                Filter
                                  ColumnarToRow
                                    Scan parquet 
