Project
  HashAggregate
    HashAggregate
      Union
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
        HashAggregate
          Exchange
            HashAggregate
              Project
                Filter
                  ColumnarToRow
                    Scan parquet 
