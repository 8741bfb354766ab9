TopKPerGroup
  Exchange
    Project
      BroadcastNestedLoopJoin
        BroadcastExchange
          Project
            Filter
              ColumnarToRow
                Scan parquet 
        Project
          Filter
            ColumnarToRow
              Scan parquet 
