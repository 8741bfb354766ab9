Project
  Project
    Project
      ColumnarToRow
        Scan parquet 
