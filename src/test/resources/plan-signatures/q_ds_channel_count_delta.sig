Sort
  Exchange
    Project
      BroadcastHashJoin [broadcast,plain]
        Project
          Filter
            InMemoryTableScan
        Project
          Filter
            InMemoryTableScan
