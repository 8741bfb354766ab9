TopKPerGroup
  Exchange
    Project
      BroadcastNestedLoopJoin [broadcast,plain]
        Project
          Filter
            ColumnarToRow
              Scan parquet 
        Project
          Filter
            ColumnarToRow
              Scan parquet 
