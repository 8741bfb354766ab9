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
                    Project
                      ColumnarToRow
                        Scan parquet 
