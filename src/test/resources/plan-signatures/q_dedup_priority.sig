HashAggregate
  Exchange
    HashAggregate
      Project
        SortAggregate
          Sort
            Exchange
              SortAggregate
                Sort
                  Project
                    ColumnarToRow
                      Scan parquet 
