HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          HashAggregate
            HashAggregate
              Project
                Window
                  Window
                    Sort
                      Exchange
                        Filter
                          InMemoryTableScan
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                InMemoryTableScan
              HashAggregate
                HashAggregate
                  Project
                    Window
                      Window
                        Sort
                          Exchange
                            Filter
                              InMemoryTableScan
