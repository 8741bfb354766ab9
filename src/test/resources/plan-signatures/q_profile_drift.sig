HashAggregate
  HashAggregate
    Window
      Sort
        Exchange
          HashAggregate
            Exchange
              HashAggregate
                Project
                  ColumnarToRow
                    Scan parquet 
