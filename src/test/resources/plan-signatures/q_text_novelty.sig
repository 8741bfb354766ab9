TakeOrderedAndProject
  Project
    Project
      BroadcastHashJoin [broadcast,plain]
        HashAggregate
          Exchange
            HashAggregate
              Filter
                HashAggregate
                  Exchange
                    HashAggregate
                      Generate
                        Filter
                          InMemoryTableScan
        Project
          InMemoryTableScan
