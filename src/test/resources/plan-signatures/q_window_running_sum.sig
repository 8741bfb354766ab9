Project
  Window
    Sort
      Exchange
        Project
          ColumnarToRow
            Scan parquet 
