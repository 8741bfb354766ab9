HashAggregate
  Exchange
    HashAggregate
      InMemoryTableScan
