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
                      ColumnarToRow
                        Scan parquet 
