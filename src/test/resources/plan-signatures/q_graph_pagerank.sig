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
                                                                        Filter
                                                                          InMemoryTableScan
      InMemoryTableScan
