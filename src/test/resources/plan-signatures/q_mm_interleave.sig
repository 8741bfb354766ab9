HashAggregate
  HashAggregate
    Project
      Window
        Sort
          Exchange
            Union
              Project
                ColumnarToRow
                  Scan parquet 
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
