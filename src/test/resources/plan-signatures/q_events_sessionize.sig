HashAggregate
  HashAggregate
    HashAggregate
      HashAggregate
        Project
          Window
            Project
              Window
                Sort
                  Exchange
                    ColumnarToRow
                      Scan parquet 
