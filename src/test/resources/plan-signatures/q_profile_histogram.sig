HashAggregate
  Exchange
    HashAggregate
      Project
        ColumnarToRow
          Scan parquet 
