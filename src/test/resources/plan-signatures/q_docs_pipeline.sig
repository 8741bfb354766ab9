HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin
          BroadcastExchange
            Exchange
              Project
                Filter
                  Scan ExistingRDD
          Exchange
            InMemoryTableScan
