Project
  Window
    Sort
      Exchange
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  Window
                    Sort
                      Exchange
                        ColumnarToRow
                          Scan parquet 
