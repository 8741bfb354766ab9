HashAggregate
  Exchange
    HashAggregate
      SortAggregate
        Sort
          Exchange
            SortAggregate
              Sort
                HashAggregate
                  Exchange
                    HashAggregate
                      Project
                        Exchange
                          ColumnarToRow
                            Scan parquet 
