HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Exchange
            Project
              Filter
                Scan ExistingRDD
          InMemoryTableScan
