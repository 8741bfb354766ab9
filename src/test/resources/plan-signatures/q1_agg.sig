Sort
  Exchange
    HashAggregate
      Exchange
        HashAggregate
          Project
            Filter
              ColumnarToRow
                Scan parquet 
