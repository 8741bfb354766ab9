TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      HashAggregate
        Exchange
          HashAggregate
            Project
              BroadcastHashJoin [broadcast,plain]
                Filter
                  InMemoryTableScan
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        BroadcastHashJoin [broadcast,plain]
                          Filter
                            InMemoryTableScan
                          HashAggregate
                            Exchange
                              HashAggregate
                                Project
                                  BroadcastHashJoin [broadcast,plain]
                                    Filter
                                      InMemoryTableScan
                                    HashAggregate
                                      Exchange
                                        HashAggregate
                                          Project
                                            BroadcastHashJoin [broadcast,plain]
                                              Filter
                                                InMemoryTableScan
                                              HashAggregate
                                                Exchange
                                                  HashAggregate
                                                    Project
                                                      Filter
                                                        InMemoryTableScan
      InMemoryTableScan
