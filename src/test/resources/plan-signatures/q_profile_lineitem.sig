Generate
  ObjectHashAggregate
    Exchange
      ObjectHashAggregate
        ColumnarToRow
          Scan parquet 
