SortAggregate
  SortAggregate
    Window
      Sort
        Exchange
          Project
            Project
              ColumnarToRow
                Scan parquet 
