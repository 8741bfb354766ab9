Generate
  ObjectHashAggregate
    Exchange
      ObjectHashAggregate
        Project
          Exchange
            ColumnarToRow
              Scan parquet 
