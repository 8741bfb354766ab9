HashAggregate
  Exchange
    HashAggregate
      Expand
        Project
          BroadcastNestedLoopJoin [broadcast,plain]
            Filter
              HashAggregate
                Exchange
                  HashAggregate
                    ColumnarToRow
                      Scan parquet 
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  InMemoryTableScan
                Project
                  Filter
                    HashAggregate
                      Exchange
                        HashAggregate
                          HashAggregate
                            Exchange
                              HashAggregate
                                Filter
                                  InMemoryTableScan
