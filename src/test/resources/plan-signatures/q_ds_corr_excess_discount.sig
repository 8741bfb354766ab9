HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Filter
                    ColumnarToRow
                      Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
