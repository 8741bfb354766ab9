Project
  Filter
    ColumnarToRow
      Scan parquet 
