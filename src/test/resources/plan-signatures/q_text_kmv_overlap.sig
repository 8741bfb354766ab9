Project
  BroadcastNestedLoopJoin [broadcast,plain]
    ObjectHashAggregate
      Exchange
        ObjectHashAggregate
          Generate
            Filter
              ColumnarToRow
                Scan parquet 
    ObjectHashAggregate
      Exchange
        ObjectHashAggregate
          Generate
            Filter
              ColumnarToRow
                Scan parquet 
