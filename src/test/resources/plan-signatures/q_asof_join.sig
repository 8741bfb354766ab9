HashAggregate
  HashAggregate
    Project
      Filter
        Window
          Sort
            Exchange
              Union
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
                Project
                  Filter
                    ColumnarToRow
                      Scan parquet 
