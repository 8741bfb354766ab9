HashAggregate
  HashAggregate
    Project
      BroadcastHashJoin [broadcast,plain]
        Generate
          Filter
            InMemoryTableScan
        Generate
          Filter
            InMemoryTableScan
