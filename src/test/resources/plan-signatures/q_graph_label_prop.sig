HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Exchange
            Filter
              Scan ExistingRDD
          Project
            ColumnarToRow
              Scan parquet 
