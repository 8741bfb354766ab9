HashAggregate
  Exchange
    HashAggregate
      Project
        Project
          Project
            ColumnarToRow
              Scan parquet 
