HashAggregate
  Exchange
    HashAggregate
      Expand
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
                        HashAggregate
                          Filter
                            InMemoryTableScan
