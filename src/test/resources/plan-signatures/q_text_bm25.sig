TakeOrderedAndProject
  Project
    BroadcastNestedLoopJoin [broadcast,plain]
      BroadcastNestedLoopJoin [broadcast,plain]
        HashAggregate
          Exchange
            HashAggregate
              HashAggregate
                Exchange
                  HashAggregate
                    HashAggregate
                      Exchange
                        HashAggregate
                          Filter
                            Generate
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
                        Filter
                          Generate
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
              ColumnarToRow
                Scan parquet 
