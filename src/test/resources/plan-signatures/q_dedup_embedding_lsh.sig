HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            Filter
              Generate
                Filter
                  InMemoryTableScan
          Project
            Filter
              Generate
                Filter
                  InMemoryTableScan
