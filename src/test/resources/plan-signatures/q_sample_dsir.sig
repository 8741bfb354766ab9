TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastNestedLoopJoin [broadcast,plain]
            BroadcastNestedLoopJoin [broadcast,plain]
              HashAggregate
                Exchange
                  HashAggregate
                    InMemoryTableScan
              HashAggregate
                Exchange
                  HashAggregate
                    InMemoryTableScan
            Project
              BroadcastHashJoin [broadcast,plain]
                InMemoryTableScan
                Project
                  BroadcastHashJoin [broadcast,plain]
                    Generate
                      Project
                        Filter
                          ColumnarToRow
                            Scan parquet 
                    InMemoryTableScan
