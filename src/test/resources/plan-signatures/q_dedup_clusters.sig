HashAggregate
  Exchange
    HashAggregate
      Project
        Scan ExistingRDD
