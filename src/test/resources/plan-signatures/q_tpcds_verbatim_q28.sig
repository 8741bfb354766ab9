BroadcastNestedLoopJoin [broadcast,plain]
  BroadcastNestedLoopJoin [broadcast,plain]
    BroadcastNestedLoopJoin [broadcast,plain]
      BroadcastNestedLoopJoin [broadcast,plain]
        BroadcastNestedLoopJoin [broadcast,plain]
          HashAggregate
            Exchange
              HashAggregate
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
          HashAggregate
            Exchange
              HashAggregate
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    Project
                      Filter
                        ColumnarToRow
                          Scan parquet 
      HashAggregate
        Exchange
          HashAggregate
            HashAggregate
              Exchange
                HashAggregate
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
    HashAggregate
      Exchange
        HashAggregate
          HashAggregate
            Exchange
              HashAggregate
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
  HashAggregate
    Exchange
      HashAggregate
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
