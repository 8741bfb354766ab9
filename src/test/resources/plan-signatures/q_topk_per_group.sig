TopKPerGroup
  Exchange
    Project
      ColumnarToRow
        Scan parquet 
