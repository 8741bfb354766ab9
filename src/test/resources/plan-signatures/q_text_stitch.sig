HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Union
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
          Union
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
            Project
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
