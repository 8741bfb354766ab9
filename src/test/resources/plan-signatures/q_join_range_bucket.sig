HashAggregate
  Exchange
    HashAggregate
      Project
        BroadcastHashJoin [broadcast,plain]
          Generate
            Project
              Filter
                ColumnarToRow
                  Scan parquet 
          Project
            Filter
              ColumnarToRow
                Scan parquet 
