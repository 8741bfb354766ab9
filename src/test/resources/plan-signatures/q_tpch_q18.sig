TakeOrderedAndProject
  Project
    BroadcastHashJoin [broadcast,plain]
      Filter
        ColumnarToRow
          Scan parquet 
      Project
        BroadcastHashJoin [broadcast,plain]
          Filter
            ColumnarToRow
              Scan parquet 
          Filter
            HashAggregate
              Exchange
                HashAggregate
                  Filter
                    ColumnarToRow
                      Scan parquet 
