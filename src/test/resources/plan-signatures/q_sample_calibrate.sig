HashAggregate
  HashAggregate
    Project
      Filter
        Window
          Window
            Sort
              Exchange
                ColumnarToRow
                  Scan parquet 
