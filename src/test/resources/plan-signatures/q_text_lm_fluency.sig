Project
  HashAggregate
    Exchange
      HashAggregate
        Project
          BroadcastHashJoin [broadcast,plain]
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  InMemoryTableScan
                HashAggregate
                  Exchange
                    HashAggregate
                      Filter
                        InMemoryTableScan
            Project
              Filter
                Generate
                  Project
                    Filter
                      ColumnarToRow
                        Scan parquet 
