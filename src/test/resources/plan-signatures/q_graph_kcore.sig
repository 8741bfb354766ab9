TakeOrderedAndProject
  HashAggregate
    Exchange
      HashAggregate
        Union
          Project
            Scan ExistingRDD
          Project
            Scan ExistingRDD
