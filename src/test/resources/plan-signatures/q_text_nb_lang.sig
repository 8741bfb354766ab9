HashAggregate
  Exchange
    HashAggregate
      SortAggregate
        Sort
          Exchange
            SortAggregate
              Sort
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          BroadcastNestedLoopJoin [broadcast,plain]
                            Project
                              BroadcastNestedLoopJoin [broadcast,plain]
                                HashAggregate
                                  Exchange
                                    HashAggregate
                                      ColumnarToRow
                                        Scan parquet 
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Filter
                                            ColumnarToRow
                                              Scan parquet 
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Filter
                                            InMemoryTableScan
                            Project
                              Generate
                                ColumnarToRow
                                  Scan parquet 
                          Filter
                            InMemoryTableScan
