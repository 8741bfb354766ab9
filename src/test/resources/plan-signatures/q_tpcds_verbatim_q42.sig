HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Project
            BroadcastHashJoin [broadcast,plain]
              Filter
                ColumnarToRow
                  Scan parquet 
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
